"""Runtime substrate: logging, YAML IO, small helpers.

TPU-native re-implementation of the utility layer of the reference framework
(see /root/reference/ultralytics/utils/__init__.py for the surface we mirror:
LOGGER, yaml_load/yaml_save, colorstr, IterableSimpleNamespace). No torch here.
"""

from __future__ import annotations

import logging
import math
import os
import platform
import re
import sys
import time
from pathlib import Path
from types import SimpleNamespace
from typing import Any

import numpy as np
import yaml

# ---------------------------------------------------------------------------
# Globals
# ---------------------------------------------------------------------------

PKG_ROOT = Path(__file__).resolve().parents[1]  # spectrogram_yolov11_tpu/
REPO_ROOT = PKG_ROOT.parent
DEFAULT_CFG_PATH = PKG_ROOT / "cfg" / "default.yaml"
ASSETS = PKG_ROOT / "assets"
VERBOSE = str(os.getenv("SYT_VERBOSE", "true")).lower() == "true"
RUNS_DIR = Path(os.getenv("SYT_RUNS_DIR", REPO_ROOT / "runs"))

# In JAX SPMD there is no per-process rank fork for single-host work; we keep
# RANK for API familiarity (reference: utils/__init__.py:33-34). Multi-host
# JAX sets these via jax.process_index() lazily (see parallel/mesh.py).
RANK = int(os.getenv("RANK", -1))
LOCAL_RANK = int(os.getenv("LOCAL_RANK", -1))


def set_logging(name: str = "syt", verbose: bool = True) -> logging.Logger:
    """Configure a stream logger (idempotent)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(h)
    logger.setLevel(logging.INFO if (verbose and RANK in {-1, 0}) else logging.ERROR)
    logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


def colorstr(*input):  # noqa: A002
    """Colorize a string for terminal output, e.g. colorstr('blue', 'bold', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def emojis(string: str = "") -> str:
    """Strip emoji on platforms that cannot render them."""
    return string.encode().decode("ascii", "ignore") if platform.system() == "Windows" else string


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration over (key, value) pairs and dict-style get."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


# ---------------------------------------------------------------------------
# YAML IO
# ---------------------------------------------------------------------------


def yaml_load(file: str | Path, append_filename: bool = False) -> dict:
    """Load a YAML file to dict (UTF-8, tolerant of non-printable chars)."""
    path = Path(file)
    assert path.suffix in {".yaml", ".yml"}, f"not a YAML file: {file}"
    with open(path, errors="ignore", encoding="utf-8") as f:
        s = f.read()
        if not s.isprintable():
            s = re.sub(r"[^\x09\x0A\x0D\x20-\x7E\x85\xA0-퟿-�\U00010000-\U0010ffff]+", "", s)
        data = yaml.safe_load(s) or {}
        if append_filename:
            data["yaml_file"] = str(file)
        return data


def yaml_save(file: str | Path, data: dict | None = None, header: str = "") -> None:
    """Save dict to a YAML file, stringifying non-serializable values."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    data = data or {}
    valid = {}
    for k, v in data.items():
        if isinstance(v, Path):
            v = str(v)
        elif isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        elif not isinstance(v, (int, float, str, bool, list, dict, tuple, type(None))):
            v = str(v)
        valid[k] = v
    with open(file, "w", errors="ignore", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(valid, f, sort_keys=False, allow_unicode=True)


def yaml_print(data: dict | SimpleNamespace | Path | str) -> None:
    """Pretty-print a YAML-able mapping."""
    d = yaml_load(data) if isinstance(data, (str, Path)) else vars(data) if isinstance(data, SimpleNamespace) else data
    LOGGER.info(yaml.safe_dump(d, sort_keys=False, allow_unicode=True))


# ---------------------------------------------------------------------------
# Small numerics / misc helpers
# ---------------------------------------------------------------------------


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of divisor (reference: utils/ops.py)."""
    return math.ceil(x / divisor) * divisor


def clean_url(url: str) -> str:
    """Strip auth query strings from a URL-ish path."""
    return str(url).split("?")[0]


def get_latest_run(search_dir: str | Path | None = None) -> str:
    """Newest last*.ckpt under the runs dir — powers `resume=True` without an
    explicit path (reference: utils/files.py get_latest_run)."""
    root = Path(search_dir) if search_dir else RUNS_DIR
    ckpts = list(root.rglob("last*.ckpt"))
    return str(max(ckpts, key=lambda p: p.stat().st_mtime)) if ckpts else ""


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3 ... (reference: utils/files.py:107)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def init_seeds(seed: int = 0) -> "np.random.Generator":
    """Seed python/numpy RNGs and return a numpy Generator. JAX randomness is
    handled by explicit jax.random keys threaded through the train state, so
    there is no global JAX seed to set (functional-by-design)."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


class Profile:
    """Wall-clock profiler usable as context manager, accumulating dt in seconds.

    Mirrors the per-phase timer of the reference (utils/ops.py:17) with
    jax.block_until_ready-awareness delegated to callers (pass synced fn).
    """

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt

    def __str__(self):
        return f"Elapsed time is {self.t} s"


class TQDM:
    """Minimal tqdm-compatible progress wrapper (no external dep needed; tqdm
    may exist in the image, but keep a fallback)."""

    def __new__(cls, iterable=None, **kwargs):
        try:
            from tqdm import tqdm as _tqdm

            kwargs.setdefault("bar_format", "{l_bar}{bar:10}{r_bar}")
            kwargs.setdefault("disable", not VERBOSE or kwargs.pop("disable", False))
            return _tqdm(iterable, **kwargs)
        except ImportError:
            return iterable


def threaded(func):
    """Run target function in a daemon thread (reference: utils/__init__.py:989)."""
    import threading

    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t

    return wrapper


class SimpleClass:
    """Base giving readable repr and attribute error messages."""

    def __str__(self):
        attr = []
        for a in dir(self):
            v = getattr(self, a)
            if not callable(v) and not a.startswith("_"):
                attr.append(f"{a}: {v.__class__.__module__}.{v.__class__.__name__} object")
        return f"{self.__class__.__module__}.{self.__class__.__name__} object with attributes:\n\n" + "\n".join(attr)

    def __repr__(self):
        return self.__str__()

    def __getattr__(self, attr):
        name = self.__class__.__name__
        raise AttributeError(f"'{name}' object has no attribute '{attr}'. See valid attributes below.\n{self.__doc__}")


class SettingsManager(dict):
    """Persistent user settings (reference: utils/__init__.py:1174) stored at
    ~/.config/spectrogram_yolov11_tpu/settings.json."""

    def __init__(self, file: "Path | None" = None):
        import json

        self.file = Path(file or Path.home() / ".config" / "spectrogram_yolov11_tpu" / "settings.json")
        self.defaults = {
            "settings_version": "1.0",
            "datasets_dir": str(REPO_ROOT / "datasets"),
            "weights_dir": str(REPO_ROOT / "weights"),
            "runs_dir": str(RUNS_DIR),
            "sync": False,  # no telemetry in this build (the reference ships Sentry; we don't)
            # persistent XLA compile cache ('' disables); serving + CLI enable
            # it so restarts skip the 15-100 s first-jit compile
            "compile_cache": str(REPO_ROOT / ".jax_cache"),
        }
        super().__init__(self.defaults)
        try:
            if self.file.exists():
                self.update(json.loads(self.file.read_text()))
        except (OSError, ValueError):
            pass

    def save(self):
        import json

        try:
            self.file.parent.mkdir(parents=True, exist_ok=True)
            self.file.write_text(json.dumps(dict(self)))
        except OSError as e:
            LOGGER.warning(f"settings not saved: {e}")

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)

    def reset(self):
        self.clear()
        super().update(self.defaults)
        self.save()


SETTINGS = SettingsManager()  # singleton (reference: utils/__init__.py SETTINGS)


def clean_str(s: str) -> str:
    """Replace shell/URL-hostile special characters with '_' (reference:
    utils/ops.py clean_str:853 — used for stream-source save names)."""
    import re

    return re.sub(r"[|@#!¡·$€%&()=?¿^*;:,¨´><+]", "_", s)


class TryExcept:
    """`@TryExcept()` decorator / `with TryExcept():` context manager that
    swallows exceptions and logs them (reference: utils/__init__.py:916)."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg, self.verbose = msg, verbose

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            with self:
                return func(*args, **kwargs)

        return wrapped

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb) -> bool:
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


class Retry:
    """`@Retry(times, delay)` decorator: retry on exception with exponential
    backoff (reference: utils/__init__.py:949)."""

    def __init__(self, times: int = 3, delay: int = 2):
        self.times, self.delay = times, delay

    def __call__(self, func):
        import functools
        import time as _time

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            for attempt in range(self.times):
                try:
                    return func(*args, **kwargs)
                except Exception as e:
                    if attempt == self.times - 1:
                        raise
                    LOGGER.warning(f"Retry {attempt + 1}/{self.times} after {e}")
                    _time.sleep(self.delay * 2 ** attempt)

        return wrapped


class ThreadingLocked:
    """`@ThreadingLocked()` decorator: serialize concurrent calls through one
    lock (reference: utils/__init__.py:421)."""

    def __init__(self):
        import threading

        self.lock = threading.Lock()

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            with self.lock:
                return func(*args, **kwargs)

        return wrapped


def plt_settings(rcparams: dict | None = None, backend: str = "Agg"):
    """Decorator that runs a plotting function under temporary matplotlib
    rcParams + backend, restoring both after (reference:
    utils/__init__.py:303)."""
    rcparams = rcparams or {"font.size": 11}

    def decorator(func):
        import functools

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            import matplotlib.pyplot as plt

            original = plt.get_backend()
            switch = backend.lower() != original.lower()
            if switch:
                plt.close("all")
                plt.switch_backend(backend)
            try:
                with plt.rc_context(rcparams):
                    return func(*args, **kwargs)
            finally:
                if switch:
                    plt.close("all")
                    plt.switch_backend(original)

        return wrapped

    return decorator


def enable_compile_cache() -> None:
    """Point jax at the persistent XLA compile cache from
    SETTINGS['compile_cache'] ('' disables). A restarted server or CLI run
    then reuses serialized executables instead of re-paying the 15-100 s
    first-jit compile of the full model graph. Idempotent; safe to call
    before or after jax is first used."""
    path = str(SETTINGS.get("compile_cache") or "")
    if not path:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # unknown flag on an old jax: cache is best-effort
        LOGGER.debug(f"compile cache not enabled: {e}")


DEFAULT_CFG_DICT: dict[str, Any] = {}


def _load_default_cfg() -> dict:
    global DEFAULT_CFG_DICT
    if not DEFAULT_CFG_DICT:
        DEFAULT_CFG_DICT = {k: (None if v == "None" else v) for k, v in yaml_load(DEFAULT_CFG_PATH).items()}
    return DEFAULT_CFG_DICT


DEFAULT_CFG = IterableSimpleNamespace(**_load_default_cfg())
NUM_THREADS = min(8, max(1, os.cpu_count() - 1))
