"""Export the flagship model's jitted forward as a serialized StableHLO
artifact for serving (jax.export) — loadable on any StableHLO-capable runtime
without the Python model code.

The GraphsTuple is destructured to plain array leaves at the export boundary
so the artifact's signature is framework-free.

Usage: python scripts/export_model.py out.stablehlo
"""

from __future__ import annotations

import sys

import jax
from jax import export as jax_export

sys.path.insert(0, ".")


def main(path: str):
    import __graft_entry__ as g
    from phc_gnn_tpu.graph.batch import GraphsTuple

    fn, (variables, batch) = g.entry()

    def forward(variables, nodes, edges, senders, receivers, graph_ids,
                node_mask, edge_mask, graph_mask):
        b = GraphsTuple(nodes=nodes, edges=edges, senders=senders,
                        receivers=receivers, graph_ids=graph_ids,
                        node_mask=node_mask, edge_mask=edge_mask,
                        graph_mask=graph_mask, y=None)
        return fn(variables, b)

    args = (variables, batch.nodes, batch.edges, batch.senders,
            batch.receivers, batch.graph_ids, batch.node_mask,
            batch.edge_mask, batch.graph_mask)
    exported = jax_export.export(jax.jit(forward))(*args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    print(f"wrote {path}: {len(blob)} bytes")
    back = jax_export.deserialize(blob)
    out = back.call(*args)
    print("round-trip call ok:", out.shape)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/phc_gnn_fwd.stablehlo")
