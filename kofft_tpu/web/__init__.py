"""kofft_tpu.web — streaming spectrogram service (web-spectrogram analog)."""

from .state import StreamingSpectrogram  # noqa: F401
from .server import make_server, app_routes  # noqa: F401
