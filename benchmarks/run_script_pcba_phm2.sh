#!/bin/bash
# canonical molpcba PHC-2 config (reference: benchmarks/run_script_pcba_phm4.sh)
#
# The logical batch stays 512 graphs, delivered as grad_accum 4 x 128-graph
# sub-batches padded to 4096n/8192e — the measured-fastest single-chip recipe
# (KERNELS.md round-4 pcba-scale table: 12.04 ms/logical batch = 2.18 M
# edges/s vs 20.64 ms for one 16384n bucket).  Exact weighted grads; BN
# normalizes per sub-batch (dp-style semantics, PARITY.md divergence #12).
# Eval keeps the 512-graph bucket (no accumulation on the eval path).
python benchmarks/train_pcba.py \
  --phm_dim 2 --type add --aggr_msg sum --mlp_mp false \
  --input_embed_dim 512 --mp_units 512,512,512,512,512,512,512 --d_units 768,256 \
  --dropout_mpnn 0.3,0.3,0.3,0.3,0.3,0.3,0.3 --dropout_dn 0.4,0.2 \
  --batch_size 128 --grad_accum 4 --max_nodes 4096 --max_edges 8192 \
  --eval_batch_size 512 \
  --lr 1e-3 --patience 5 --factor 0.75 \
  --epochs 150 --weightdecay 0.0 "$@"
