#!/bin/bash
# canonical molhiv PHC-4 config (reference: benchmarks/run_script_hiv_phm4.sh)
python benchmarks/train_hiv.py \
  --phm_dim 4 --type add --aggr_msg softmax --mlp_mp true \
  --input_embed_dim 200 --mp_units 200,200 --d_units 128,64 \
  --dropout_mpnn 0.1,0.1 --dropout_dn 0.3,0.2 \
  --batch_size 128 --lr 5e-4 --patience 10 --factor 0.75 \
  --epochs 50 --weightdecay 0.1 "$@"
