#!/usr/bin/env bash
# usage: scripts/train.sh -g <num_devices> -d <dataset> -c <config_name> -n <exp_name>
set -e
while getopts "g:d:c:n:" opt; do
  case $opt in
    g) DEVICES=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) NAME=$OPTARG ;;
    *) exit 1 ;;
  esac
done
DEVICES=${DEVICES:-}
EXTRA=""
if [ -n "$DEVICES" ]; then EXTRA="num_devices=$DEVICES"; fi
python tools/train.py --config-file "configs/${DATASET}/${CONFIG}.py" \
  --options "save_path=exp/${DATASET}/${NAME}" $EXTRA
