from .dataset import (
    CMUMOSEIDataset,
    DataLoader,
    FewShotDataset,
    IEMOCAPDataset,
    MELDDataset,
    MultimodalDataset,
    SamplePDataset,
    collate,
    create_dataloader,
    get_dataset,
)
from .pipeline import prefetch_to_device
from .sample_data import create_sample_dataset
from .tokenizer import HashTokenizer, get_tokenizer
