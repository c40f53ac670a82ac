def reset(value):
    """PyG's one-level reset: call reset_parameters on children if any, else on
    the module itself."""
    def _reset(item):
        if hasattr(item, "reset_parameters"):
            item.reset_parameters()

    if value is not None:
        children = list(value.children()) if hasattr(value, "children") else []
        if children:
            for item in children:
                _reset(item)
        else:
            _reset(value)
