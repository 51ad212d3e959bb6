"""Host-side data pipeline: patch store, raw decode, dataset compositions,
prefetching loader, and offline dataset builders."""

from eld_tpu.data.pairs import read_paired_fns, compute_expo_ratio  # noqa: F401
from eld_tpu.data.patchstore import PatchStore, PatchStoreWriter  # noqa: F401
