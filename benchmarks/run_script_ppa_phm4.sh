#!/bin/bash
# canonical ogbg-ppa PHC-4 config (reference: benchmarks/run_script_ppa_phm4.sh)
python benchmarks/train_ppa.py \
  --phm_dim 4 --type add --aggr_msg softmax --mlp_mp true \
  --input_embed_dim 200 --mp_units 200,200,200 --d_units 256,128 \
  --dropout_mpnn 0.2,0.2,0.2 --dropout_dn 0.3,0.2 \
  --batch_size 128 --lr 5e-4 --patience 8 --factor 0.75 \
  --epochs 100 --weightdecay 0.05 "$@"
