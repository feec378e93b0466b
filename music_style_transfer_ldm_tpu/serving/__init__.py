"""Serving: device-resident inference engine + HTTP server.

The reference has no serving layer at all (SURVEY.md section 1: "inference"
is test functions calling model methods).  This package provides the
production path: a warm, pre-compiled engine with request microbatching,
and a dependency-free HTTP front end.
"""

from music_style_transfer_ldm_tpu.serving.engine import (  # noqa: F401
    EngineConfig, InferenceEngine,
)
from music_style_transfer_ldm_tpu.serving.server import serve  # noqa: F401
