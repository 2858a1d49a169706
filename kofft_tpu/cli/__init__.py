"""kofft_tpu.cli — command-line tools (sanity-check spectrogram renderer)."""
