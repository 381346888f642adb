# Set up environment for this recipe.
# MAIN_ROOT may be pre-set (e.g. by the recipe smoke tests running from a
# temporary copy); default is two levels up from the recipe directory.
export MAIN_ROOT=${MAIN_ROOT:-$PWD/../..}
export SRC_ROOT=$MAIN_ROOT/openasr_tpu
export PYTHONPATH=$MAIN_ROOT:$PYTHONPATH
