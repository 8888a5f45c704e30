"""End-to-end modes: compress / decompress / estimate (reference: modes.cpp)."""

from wavelet_tpu.pipeline.common import Config, format_files, format_levels, clean_string  # noqa: F401
from wavelet_tpu.pipeline.compress import compress_run  # noqa: F401
from wavelet_tpu.pipeline.decompress import decompress_run  # noqa: F401
from wavelet_tpu.pipeline.estimate import estimate_run  # noqa: F401
from wavelet_tpu.pipeline.check import check_run  # noqa: F401
