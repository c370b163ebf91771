#!/bin/sh
# train recipe for vitti in the rgb domain (TPU SPMD; all local devices)
python train.py --model_arch=vitti --embed_type=1 --domain=rgb \
  --datapath=/data/imagenet/tarfiles --temp_datapath=/tmp/imagenet_data \
  --indexpaths=assets/index_train.csv,assets/index_val.csv \
  --num_cpus=32 --train --eval --savepath=./models/rgbnomore_rgbti.msgpack --verbose=1
