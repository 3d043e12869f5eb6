"""Pretrained-weight / dataset downloader (reference ``ppsci/utils/download.py:70``).

This environment has no network egress; ``get_weights_path_from_url`` keeps
the reference contract (URL -> local cache path) by resolving into a local
cache directory and raising a clear error when the artifact is absent
instead of downloading. Drop files into ~/.paddlescience_tpu/weights
manually (or mount them) and the same call sites work unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

from paddlescience_tpu.utils import logger

__all__ = ["get_weights_path_from_url", "WEIGHTS_HOME"]

WEIGHTS_HOME = os.path.expanduser("~/.paddlescience_tpu/weights")


def get_weights_path_from_url(url: str, md5sum: Optional[str] = None) -> str:
    fname = url.split("/")[-1].split("?")[0]
    path = os.path.join(WEIGHTS_HOME, fname)
    if os.path.exists(path):
        logger.info(f"Using cached weights: {path}")
        return path
    raise FileNotFoundError(
        f"'{fname}' not found in {WEIGHTS_HOME} and this environment has no "
        f"network egress. Place the file there manually (source: {url})."
    )
