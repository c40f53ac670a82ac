"""The four reference model classes, expressed as PHCGNN configurations.

- PHMSkipConnectAdd / PHMSkipConnectConcat
  (reference: phc/hypercomplex/undirectional/models.py:24,271)
- QuaternionSkipConnectAdd / QuaternionSkipConnectConcat = the same at
  phm_dim=4 with the standard (quaternion) rule
  (reference: phc/quaternion/undirectional/models.py:25,234) — the reference's
  own tests prove PHM(n=4) == quaternion (tests/test_realrepr_sumkronecker.py).
"""

from __future__ import annotations

from phc_gnn_tpu.models.phc_gnn import PHCGNN

__all__ = [
    "PHMSkipConnectAdd",
    "PHMSkipConnectConcat",
    "QuaternionSkipConnectAdd",
    "QuaternionSkipConnectConcat",
]


def PHMSkipConnectAdd(**kwargs) -> PHCGNN:
    kwargs.setdefault("skip_connect", "add")
    return PHCGNN(**kwargs)


def PHMSkipConnectConcat(**kwargs) -> PHCGNN:
    kwargs.setdefault("skip_connect", "concat")
    kwargs.setdefault("atom_encoded_dim", 128)
    kwargs.setdefault("mp_layers", (128, 196, 256))
    return PHCGNN(**kwargs)


def QuaternionSkipConnectAdd(**kwargs) -> PHCGNN:
    kwargs["phm_dim"] = 4
    kwargs.setdefault("c_init", "standard")
    kwargs.setdefault("learn_phm", False)
    kwargs.setdefault("skip_connect", "add")
    return PHCGNN(**kwargs)


def QuaternionSkipConnectConcat(**kwargs) -> PHCGNN:
    kwargs["phm_dim"] = 4
    kwargs.setdefault("c_init", "standard")
    kwargs.setdefault("learn_phm", False)
    kwargs.setdefault("skip_connect", "concat")
    kwargs.setdefault("atom_encoded_dim", 128)
    kwargs.setdefault("mp_layers", (128, 196, 256))
    return PHCGNN(**kwargs)
