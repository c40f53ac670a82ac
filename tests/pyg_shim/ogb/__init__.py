from . import graphproppred, utils  # noqa: F401
