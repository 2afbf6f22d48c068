"""Dataset walkers and list parsers (host-side I/O only)."""
from .librimix import Libri2Mix8kDataset, LibriMixDataset, LibriMixItem

__all__ = ["Libri2Mix8kDataset", "LibriMixDataset", "LibriMixItem"]
