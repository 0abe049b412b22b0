"""Data layer (L2): probe registry, transforms, host loader, batch contract."""

from mammodissect.data.probes import PROBES, get_probe, ArrayProbe, FolderProbe, TxtListProbe, CsvProbe
from mammodissect.data.loader import iter_batches

__all__ = [
    "PROBES",
    "get_probe",
    "ArrayProbe",
    "FolderProbe",
    "TxtListProbe",
    "CsvProbe",
    "iter_batches",
]
