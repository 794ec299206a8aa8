from .walks import (
    REGISTRY,
    apply_walk,
    init_walk,
    resolve_walk_kind,
    walk_space,
)
