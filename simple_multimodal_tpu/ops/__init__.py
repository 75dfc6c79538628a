from .adapters import AdapterLayer, ModalityDropout, modality_dropout
from .attention import MultiHeadAttention
from .lstm import LSTM
