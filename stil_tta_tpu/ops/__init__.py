from stil_tta_tpu.ops.metrics import (
    AccuracyState,
    AUROCState,
    accuracy_init,
    accuracy_update,
    accuracy_compute,
    auroc_init,
    auroc_update,
    auroc_compute,
)
