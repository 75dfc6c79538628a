from .deberta import DebertaConfig, DebertaModel
from .encoders import AudioEncoder, TextEncoder, VideoEncoder
from .fusion import (
    AdaptiveFusion,
    ContrastiveFusion,
    CrossModalTransformer,
    EarlyFusion,
    GraphFusion,
    HierarchicalFusion,
    LateFusion,
    MultimodalTransformer,
)
from .multimodal_model import (
    EmotionClassifier,
    FewShotModel,
    KnowledgeDistillationModel,
    MultimodalEmotionModel,
    RobustMultimodalModel,
    create_model,
    load_pretrained_model,
)
from .vit import ViTConfig, ViTModel
from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
