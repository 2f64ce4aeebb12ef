#!/usr/bin/env bash
# usage: scripts/test.sh -d <dataset> -c <config_name> -n <exp_name> [-w <ckpt>]
set -e
CKPT=model_best
while getopts "d:c:n:w:" opt; do
  case $opt in
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) NAME=$OPTARG ;;
    w) CKPT=$OPTARG ;;
    *) exit 1 ;;
  esac
done
python tools/test.py --config-file "configs/${DATASET}/${CONFIG}.py" \
  --checkpoint "$CKPT" --options "save_path=exp/${DATASET}/${NAME}"
