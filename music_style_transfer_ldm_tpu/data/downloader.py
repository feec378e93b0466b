"""YouTube audio acquisition (ref: data/yt_audio_downloader.py).

Host-side by nature. yt-dlp and FFmpeg are optional runtime dependencies
(absent in air-gapped environments); every entry point degrades to a clear
error, and per-URL failures are collected and reported at the end exactly
like the reference (ref: yt_audio_downloader.py:76-83,117-128).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import List, Optional, Tuple


class AudioDownloader:
    """ref: yt_audio_downloader.py:11 (class), :22 download_audio,
    :53 download_from_file, :87 download_from_csv."""

    def __init__(self, output_dir: str = "downloads",
                 audio_format: str = "mp3", retries: int = 2):
        self.output_dir = Path(output_dir)
        self.audio_format = audio_format
        self.retries = retries
        self.failures: List[Tuple[str, str]] = []

    def _ydl_opts(self, out_dir: Path) -> dict:
        # bestaudio + FFmpeg extraction, mirroring the reference's options
        # (ref: yt_audio_downloader.py:31-45).
        return {
            "format": "bestaudio/best",
            "outtmpl": str(out_dir / "%(title)s.%(ext)s"),
            "postprocessors": [{
                "key": "FFmpegExtractAudio",
                "preferredcodec": self.audio_format,
                "preferredquality": "192",
            }],
            "quiet": True,
            "noprogress": True,
        }

    def download_audio(self, url: str, instrument: str = "",
                       title: Optional[str] = None) -> Optional[Path]:
        """Download one URL into downloads/<instrument>/; returns the
        directory on success, None on failure (failure recorded)."""
        try:
            import yt_dlp  # noqa: PLC0415
        except ImportError as e:
            raise RuntimeError(
                "yt-dlp is not installed; acquisition requires network "
                "tooling unavailable in this environment") from e

        out_dir = self.output_dir / instrument if instrument \
            else self.output_dir
        out_dir.mkdir(parents=True, exist_ok=True)
        opts = self._ydl_opts(out_dir)
        if title:
            opts["outtmpl"] = str(out_dir / f"{title}.%(ext)s")

        last_err = None
        for _ in range(self.retries + 1):
            try:
                with yt_dlp.YoutubeDL(opts) as ydl:
                    ydl.download([url])
                return out_dir
            except Exception as e:  # noqa: BLE001 — collect, keep going
                last_err = e
        self.failures.append((url, str(last_err)))
        return None

    def download_from_file(self, filepath: str) -> None:
        """One URL per line (ref: yt_audio_downloader.py:53-85)."""
        urls = [ln.strip() for ln in Path(filepath).read_text().splitlines()
                if ln.strip() and not ln.startswith("#")]
        for url in urls:
            self.download_audio(url)
        self.report_failures()

    def download_from_csv(self, filepath: str) -> None:
        """CSV rows: instrument,title,url (ref: yt_audio_downloader.py:87-128,
        data/youtube_urls.csv format)."""
        with open(filepath) as f:
            reader = csv.reader(f)
            rows = [r for r in reader if r and not r[0].startswith("#")]
        # Tolerate a header row.
        if rows and rows[0][:1] == ["instrument"]:
            rows = rows[1:]
        for row in rows:
            instrument, title, url = row[0].strip(), row[1].strip(), \
                row[2].strip()
            self.download_audio(url, instrument=instrument, title=title)
        self.report_failures()

    def report_failures(self) -> None:
        if not self.failures:
            print("All downloads completed successfully.")
            return
        print(f"{len(self.failures)} download(s) failed:")
        for url, err in self.failures:
            print(f"  {url}: {err}")
