from . import (  # noqa: F401
    checkpoint,
    export,
    finetune,
    flops,
    hf_import,
    imagenet,
    latency_model,
    logscrape,
    metrics,
    plots,
)
