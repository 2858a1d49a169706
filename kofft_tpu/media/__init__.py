"""kofft_tpu.media — song identification index."""

from .index import SongId, SongIndex  # noqa: F401
