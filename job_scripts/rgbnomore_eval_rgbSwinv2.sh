#!/bin/sh
# eval recipe for swinv2 in the rgb domain (TPU SPMD; all local devices)
python train.py --model_arch=swinv2 --embed_type=1 --domain=rgb \
  --datapath=/data/imagenet/tarfiles --temp_datapath=/tmp/imagenet_data \
  --indexpaths=assets/index_train.csv,assets/index_val.csv \
  --num_cpus=32 --eval --loadpath=./models/rgbnomore_rgbSwinv2.msgpack --verbose=1
