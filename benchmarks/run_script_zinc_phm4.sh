#!/bin/bash
# canonical ZINC PHC-4 config (reference: benchmarks/run_script_zinc_phm4.sh)
python benchmarks/train_zinc.py \
  --phm_dim 4 --type add --sc_type last --aggr_msg sum --mlp_mp true \
  --input_embed_dim 200 --mp_units 200,200,200,200 --d_units 128,64 \
  --dropout_mpnn 0.0,0.0,0.0,0.0 --dropout_dn 0.2,0.1 \
  --batch_size 128 --lr 1e-3 --patience 20 --factor 0.5 --min_lr 1e-7 \
  --epochs 1000 --weightdecay 0.0 "$@"
