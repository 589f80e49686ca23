from .vit import (  # noqa: F401
    ViT,
    deit_config,
    get_deit_base,
    get_deit_small,
    get_deit_tiny,
    get_pruned_vit,
    pruned_vit_config,
)
