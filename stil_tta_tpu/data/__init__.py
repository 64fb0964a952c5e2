from stil_tta_tpu.data.augment import (
    AugmentPipeline,
    contrastive_pipeline,
    hard_eval_pipeline,
    soft_eval_pipeline,
    weak_pipeline,
    strong_pipeline,
    default_pipeline,
)
from stil_tta_tpu.data.corrupt import corrupt_tabular
