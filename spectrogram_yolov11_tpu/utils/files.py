"""File/path helpers (reference: ultralytics/utils/files.py).

`increment_path` and `get_latest_run` live in the package root utils and are
re-exported here so reference-style imports keep working.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
from datetime import datetime
from pathlib import Path

from spectrogram_yolov11_tpu.utils import get_latest_run, increment_path  # noqa: F401


class WorkingDirectory(contextlib.ContextDecorator):
    """Temporarily chdir into `new_dir` as a context manager or decorator
    (reference: files.py:13)."""

    def __init__(self, new_dir: str | Path):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)

    def __exit__(self, exc_type, exc, tb):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path: str | Path):
    """If `path` contains spaces, copy it to a space-free temp path for the
    block's duration and copy it back after (reference: files.py:56 — some
    external toolchains choke on spaced paths)."""
    if " " not in str(path):
        yield path
        return
    was_str = isinstance(path, str)
    path = Path(path)
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp_path)
        elif path.is_file():
            tmp_path.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(path, tmp_path)
        try:
            yield str(tmp_path) if was_str else tmp_path
        finally:
            if tmp_path.is_dir():
                shutil.copytree(tmp_path, path, dirs_exist_ok=True)
            elif tmp_path.is_file():
                shutil.copy2(tmp_path, path)


def file_age(path: str | Path = __file__) -> int:
    """Days since the last modification of `path` (reference: files.py:156)."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path: str | Path = __file__) -> str:
    """Modification date as 'YYYY-M-D' (reference: files.py:162)."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path: str | Path) -> float:
    """Size of a file or directory tree in MiB (reference: files.py:168)."""
    mb = 1 << 20
    p = Path(path)
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.glob("**/*") if f.is_file()) / mb
    return 0.0


def zip_directory(directory: str | Path, compress: bool = True,
                  exclude: tuple = (".DS_Store", "__MACOSX"), progress: bool = True) -> Path:
    """Zip a directory's contents into ``<directory>.zip`` rooted at the
    directory name (reference: utils/downloads.py:93). Returns the zip path."""
    import zipfile

    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"Directory '{directory}' does not exist.")
    files = [f for f in directory.rglob("*") if f.is_file() and all(x not in f.name for x in exclude)]
    zip_file = directory.with_suffix(".zip")
    compression = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(zip_file, "w", compression) as zf:
        for f in files:
            zf.write(f, f.relative_to(directory.parent))
    return zip_file


def unzip_file(file: str | Path, path: str | Path | None = None,
               exclude: tuple = (".DS_Store", "__MACOSX"), exist_ok: bool = False,
               progress: bool = True) -> Path:
    """Unzip ``file`` into ``path`` (default: the zip's directory), wrapping
    loose top-level members in a directory named after the zip like the
    reference (utils/downloads.py:132). Returns the extraction directory."""
    import zipfile

    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as zf:
        names = [n for n in zf.namelist() if all(x not in n for x in exclude)]
        top = {Path(n).parts[0] for n in names if Path(n).parts}
        # everything under a single top-level dir -> extract as-is; else wrap
        unzip_as_dir = len(top) == 1 and not any(len(Path(n).parts) == 1 and not n.endswith("/") for n in names)
        extract_path = path if unzip_as_dir else path / file.stem
        target = (path / next(iter(top))) if unzip_as_dir else extract_path
        if target.exists() and any(target.iterdir()) and not exist_ok:
            return target
        for n in names:
            if ".." in Path(n).parts:
                continue  # zip-slip guard
            zf.extract(n, extract_path)
    return target
