#!/bin/bash
# canonical molpcba PHC-2 config (reference: benchmarks/run_script_pcba_phm4.sh)
python benchmarks/train_pcba.py \
  --phm_dim 2 --type add --aggr_msg sum --mlp_mp false \
  --input_embed_dim 512 --mp_units 512,512,512,512,512,512,512 --d_units 768,256 \
  --dropout_mpnn 0.3,0.3,0.3,0.3,0.3,0.3,0.3 --dropout_dn 0.4,0.2 \
  --batch_size 512 --lr 1e-3 --patience 5 --factor 0.75 \
  --epochs 150 --weightdecay 0.0 "$@"
