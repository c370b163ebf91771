"""Host-side data pipeline: index datasets, canvas loaders, staging tools."""

from rgbnomore_tpu.data.index import IndexDataset, load_index, split_train_minival
from rgbnomore_tpu.data.loader import DctCanvasLoader, RgbCanvasLoader
