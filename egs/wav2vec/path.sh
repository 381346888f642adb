# Set up environment for this recipe.
export MAIN_ROOT=$PWD/../..
export SRC_ROOT=$MAIN_ROOT/openasr_tpu
export PYTHONPATH=$MAIN_ROOT:$PYTHONPATH
