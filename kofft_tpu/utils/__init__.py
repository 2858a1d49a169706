"""kofft_tpu.utils — host-side helpers (transfer, image, audio, colormaps)."""

from .transfer import asnumpy  # noqa: F401
