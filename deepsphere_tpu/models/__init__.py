from .healpy_gcnn import HealpyGCNN, SequentialModel

__all__ = ["HealpyGCNN", "SequentialModel"]
