#!/bin/bash
# canonical MNIST superpixels PHC-4 config (reference: benchmarks/run_script_mnist_phm4.sh)
python benchmarks/train_mnist.py \
  --phm_dim 4 --type add --aggr_msg softmax --mlp_mp true \
  --input_embed_dim 200 --mp_units 200,200,200 --d_units 256,128 \
  --dropout_mpnn 0.1,0.1,0.1 --dropout_dn 0.3,0.2 \
  --batch_size 128 --lr 1e-3 --patience 10 --factor 0.5 --min_lr 1e-5 \
  --epochs 150 --max_time 12 "$@"
