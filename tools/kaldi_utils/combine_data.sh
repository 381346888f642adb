#!/bin/bash
# Concatenate Kaldi-style data dirs: combine_data.sh dest src1 src2 ...
# Merges the standard per-utterance tables (sorted, duplicate ids
# rejected). (capability parity with the reference's tools/combine_data.sh)
set -e
[ $# -ge 2 ] || { echo "usage: $0 <dest> <src1> [src2 ...]" 1>&2; exit 1; }
dest=$1; shift
mkdir -p "$dest"
for table in wav.scp feats.scp text utt2spk spk2gender segments; do
  present=()
  for src in "$@"; do
    [ -f "$src/$table" ] && present+=("$src/$table")
  done
  [ ${#present[@]} -eq 0 ] && continue
  sort -k1,1 -m <(cat "${present[@]}" | sort -k1,1) > "$dest/$table"
  dups=$(cut -d' ' -f1 "$dest/$table" | uniq -d | head -1)
  [ -n "$dups" ] && { echo "$0: duplicate id '$dups' in $table" 1>&2; exit 1; }
done
if [ -f "$dest/utt2spk" ]; then
  sort -k2,2 -k1,1 "$dest/utt2spk" | awk '
    {spk[$2] = spk[$2] " " $1}
    END {for (s in spk) print s spk[s]}' | sort -k1,1 > "$dest/spk2utt"
fi
echo "$0: combined $# dirs -> $dest"
