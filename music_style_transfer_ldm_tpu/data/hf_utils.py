"""HuggingFace dataset acquisition (ref: data/hf_utils.py).

Optional alternative audio source: authenticate with an HF token from
.env.local, stream the free-music-archive-small dataset and keep samples
whose only tag matches the requested genre (ref: hf_utils.py:30-59).
Gated on the optional `datasets`/`huggingface_hub` packages + network.
"""

from __future__ import annotations

from typing import Iterable, Optional

from music_style_transfer_ldm_tpu.utils.env import get_env


def authenticate(env_file: str = ".env.local") -> None:
    """Login with HF_TOKEN from the env file (ref: hf_utils.py:11-16)."""
    token = get_env("HF_TOKEN", env_file=env_file)
    if not token:
        raise RuntimeError("HF_TOKEN not set (expected in .env.local)")
    from huggingface_hub import login  # noqa: PLC0415
    login(token=token)


def download_hf_dataset(name: str = "benjamin-paine/free-music-archive-small",
                        split: str = "train", streaming: bool = True):
    """Stream the dataset (ref: hf_utils.py:19-27)."""
    from datasets import load_dataset  # noqa: PLC0415
    return load_dataset(name, split=split, streaming=streaming)


def construct_hf_dataset(tag: str = "piano", limit: Optional[int] = None
                         ) -> Iterable[dict]:
    """Yield samples whose single genre tag equals `tag`
    (ref: hf_utils.py:30-59 filter at :44-46)."""
    ds = download_hf_dataset()
    count = 0
    for sample in ds:
        tags = sample.get("tags") or sample.get("genres") or []
        if isinstance(tags, str):
            tags = [tags]
        if len(tags) == 1 and tags[0].lower() == tag.lower():
            yield sample
            count += 1
            if limit is not None and count >= limit:
                return
