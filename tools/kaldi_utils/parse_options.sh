#!/bin/bash
# Kaldi-style option parser: source this after declaring defaults to let
# callers override any variable with --var-name value flags.
# (capability parity with the reference's tools/parse_options.sh, which is
# what made its recipes flag-configurable; rebuilt from the documented
# contract: --name value sets $name, dashes map to underscores, --help
# prints usage, parsing stops at the first positional argument.)
while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --help|-h)
      if [ -z "${help_message:-}" ]; then
        echo "usage: $0 [options] args..." 1>&2
      else
        printf '%s\n' "$help_message" 1>&2
      fi
      exit 0 ;;
    --*=*)
      echo "$0: options must be '--name value', not '--name=value': $1" 1>&2
      exit 1 ;;
    --*)
      name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
      # the variable must already exist (guards against typos)
      eval '[ -z "${'"$name"'+xxx}" ]' && {
        echo "$0: invalid option $1" 1>&2; exit 1; }
      [ -z "${2:-}" ] && { echo "$0: missing value for $1" 1>&2; exit 1; }
      eval "$name=\"\$2\""
      shift 2 ;;
    *) break ;;
  esac
done
true
