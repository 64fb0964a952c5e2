from stil_tta_tpu.losses.clip_loss import clip_loss
from stil_tta_tpu.losses.prototype_loss import prototype_loss
from stil_tta_tpu.losses.club import CLUBMean, club_losses
from stil_tta_tpu.losses.common import (
    cross_entropy,
    soft_cross_entropy,
    entropy_loss,
)
