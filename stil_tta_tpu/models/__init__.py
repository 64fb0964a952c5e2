from stil_tta_tpu.models.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    image_encoder,
)
from stil_tta_tpu.models.tabular_transformer import TabularTransformerEncoder
from stil_tta_tpu.models.saint import SAINTEncoder
from stil_tta_tpu.models.backbones import (
    DisCoBackbone,
    MatchBackbone,
    SemiMultimodalBackbone,
)
