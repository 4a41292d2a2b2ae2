"""Config system: flat namespace merge + validation + `yolo` CLI entrypoint.

Mirrors the public surface of the reference config layer
(/root/reference/ultralytics/cfg/__init__.py: get_cfg:276, get_save_dir:386,
entrypoint:825) over the same flat key namespace (cfg/default.yaml here).
"""

from __future__ import annotations

import difflib
import shutil
import sys
from pathlib import Path
from types import SimpleNamespace
from typing import Any

from spectrogram_yolov11_tpu.utils import (
    DEFAULT_CFG,
    DEFAULT_CFG_DICT,
    DEFAULT_CFG_PATH,
    LOGGER,
    RUNS_DIR,
    IterableSimpleNamespace,
    colorstr,
    increment_path,
    yaml_load,
)

TASKS = {"detect", "segment", "classify", "pose", "obb"}
MODES = {"train", "val", "predict", "export", "track", "benchmark"}

TASK2DATA = {
    "detect": "shapes128.yaml",
    "segment": "shapes128-seg.yaml",
    "classify": "imagenette160",
    "pose": "shapes128-pose.yaml",
    "obb": "shapes128-obb.yaml",
}
TASK2MODEL = {
    "detect": "yolo11n.yaml",
    "segment": "yolo11n-seg.yaml",
    "classify": "yolo11n-cls.yaml",
    "pose": "yolo11n-pose.yaml",
    "obb": "yolo11n-obb.yaml",
}

# key -> expected types, for check_cfg validation (reference: cfg/__init__.py:85-180)
CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "workspace", "batch"}
CFG_FRACTION_KEYS = {
    "dropout", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
    "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr", "bgr",
    "mosaic", "mixup", "copy_paste", "conf", "iou", "fraction",
}
CFG_INT_KEYS = {
    "epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio", "max_det", "vid_stride",
    "line_width", "nbs", "save_period", "pre_nms_topk",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr", "overlap_mask",
    "val", "save_json", "save_hybrid", "half", "dnn", "plots", "show", "save_txt", "save_conf",
    "save_crop", "save_frames", "show_labels", "show_conf", "visualize", "augment", "agnostic_nms",
    "retina_masks", "show_boxes", "keras", "optimize", "int8", "dynamic", "simplify", "nms",
    "profile", "multi_scale",
}
# bool or the string "auto" (device_augment: auto = on when the warp is
# separable — degrees/shear/perspective all 0, the reference defaults)
CFG_BOOL_OR_AUTO_KEYS = {"device_augment"}


def cfg2dict(cfg: str | Path | dict | SimpleNamespace) -> dict:
    """Convert cfg object (path / dict / namespace) to a plain dict."""
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
    elif isinstance(cfg, SimpleNamespace):
        cfg = vars(cfg)
    return dict(cfg)


def check_dict_alignment(base: dict, custom: dict, e: Exception | None = None) -> None:
    """Raise with did-you-mean suggestions for unknown config keys."""
    base_keys, custom_keys = set(base), set(custom)
    mismatched = custom_keys - base_keys
    if mismatched:
        lines = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, base_keys)
            hint = f"Similar arguments: {matches}." if matches else ""
            lines.append(f"'{k}' is not a valid argument. {hint}")
        raise SyntaxError("\n".join(lines)) from e


def check_cfg(cfg: dict, hard: bool = True) -> None:
    """Type/range-validate config values in place."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be a number")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be a number")
                cfg[k] = v = float(v)
            if not 0.0 <= float(v) <= 1.0 and k not in {"lr0", "lrf", "weight_decay"}:
                pass  # several "fraction" keys legitimately exceed 1.0 upstream; no hard clamp
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be an int")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if hard:
                raise TypeError(f"'{k}={v}' must be a bool")
            cfg[k] = bool(v)
        elif k in CFG_BOOL_OR_AUTO_KEYS and not isinstance(v, bool):
            if isinstance(v, str) and v.lower() == "auto":
                cfg[k] = "auto"
            elif hard:
                raise TypeError(f"'{k}={v}' must be a bool or 'auto'")
            else:
                cfg[k] = bool(v)


def get_cfg(cfg: str | Path | dict | SimpleNamespace = DEFAULT_CFG, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge default cfg <- cfg <- overrides into a validated namespace."""
    cfg = cfg2dict(cfg)
    if overrides:
        overrides = cfg2dict(overrides)
        if "save_dir" not in cfg:
            overrides.pop("save_dir", None)
        check_dict_alignment(cfg if set(cfg) >= set(DEFAULT_CFG_DICT) else DEFAULT_CFG_DICT, overrides)
        cfg = {**cfg, **overrides}
    for k in ("project", "name"):
        if k in cfg and isinstance(cfg[k], (int, float)):
            cfg[k] = str(cfg[k])
    if cfg.get("name") == "model":
        cfg["name"] = str(cfg.get("model", "")).split(".")[0]
    if cfg.get("rect"):
        # reference rect mode batches by aspect bucket (data/base.py:261) —
        # dynamic shapes recompile per bucket under XLA, so this build always
        # square-letterboxes to one static shape (docs/migrating.md)
        from spectrogram_yolov11_tpu.utils import LOGGER

        LOGGER.warning("rect=True is not supported on TPU (dynamic shapes); using square letterbox")
        cfg["rect"] = False
    check_cfg(cfg)
    return IterableSimpleNamespace(**cfg)


def get_save_dir(args: SimpleNamespace, name: str | None = None) -> Path:
    """Compose runs/{task}/{name} save directory (reference: cfg/__init__.py:386)."""
    if getattr(args, "save_dir", None):
        return Path(args.save_dir)
    project = args.project or RUNS_DIR / args.task
    name = name or args.name or f"{args.mode}"
    return increment_path(Path(project) / name, exist_ok=getattr(args, "exist_ok", False))


def parse_key_value_pairs(pairs: list[str]) -> dict:
    """Parse ['k=v', ...] CLI tokens into a typed dict."""
    import ast

    out = {}
    for pair in pairs:
        k, sep, v = pair.partition("=")
        if not sep:
            raise SyntaxError(f"'{pair}' is not a 'key=value' pair")
        k, v = k.strip(), v.strip()
        if v.lower() == "none":
            out[k] = None
        elif v.lower() == "true":
            out[k] = True
        elif v.lower() == "false":
            out[k] = False
        else:
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
    return out


CLI_HELP_MSG = """
    Usage: yolo TASK MODE ARGS

        TASK (optional): one of {detect, segment, classify, pose, obb}
        MODE (required): one of {train, val, predict, export, track, benchmark}
        ARGS  (optional): 'key=value' overrides, e.g. imgsz=640 data=spectrogram_synth.yaml

    Examples:
        yolo detect train data=shapes128.yaml model=yolo11n.yaml epochs=3
        yolo predict model=runs/detect/train/weights/best.ckpt source=bus.jpg
        yolo val model=yolo11n.yaml data=shapes128.yaml
        yolo serve model=runs/detect/train/weights/best.ckpt port=8000
        yolo predict model=http://127.0.0.1:8000/best source=bus.jpg
"""


def _run_solution(argv: list) -> Any:
    """Dispatch `yolo solutions <Name|list> [k=v...]` to solutions/apps.py."""
    import spectrogram_yolov11_tpu.solutions as sol

    names = sorted(n for n in sol.__all__ if n[0].isupper() and n != "BaseSolution")
    if not argv or argv[0] in {"list", "help"}:
        LOGGER.info("available solutions: " + ", ".join(names))
        return None
    name = argv[0]
    if name not in names:
        raise SyntaxError(f"unknown solution '{name}'; options: {', '.join(names)}")
    kv = parse_key_value_pairs([a for a in argv[1:] if "=" in a])
    source = kv.pop("source", None)
    app = getattr(sol, name)(**kv)
    if source is None:
        LOGGER.info(f"{name} ready (pass source=... to run over frames)")
        return app
    import cv2

    cap = cv2.VideoCapture(int(source) if str(source).isdigit() else str(source))
    try:
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            app(frame)
    finally:
        cap.release()
    LOGGER.info(f"{name} finished over {source}")
    return app


def entrypoint(debug: str = "") -> Any:
    """`yolo` console entrypoint: parse `task mode k=v` tokens and dispatch."""
    argv = (debug.split(" ") if debug else sys.argv)[1:]
    if not argv:
        LOGGER.info(CLI_HELP_MSG)
        return None

    from spectrogram_yolov11_tpu.utils import enable_compile_cache

    enable_compile_cache()  # CLI runs reuse compiled executables across invocations

    overrides: dict[str, Any] = {}
    task = mode = None
    kv: list[str] = []
    for a in argv:
        if a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a in {"help", "-h", "--help"}:
            LOGGER.info(CLI_HELP_MSG)
            return None
        elif a == "checks":
            from spectrogram_yolov11_tpu.utils.checks import collect_system_info

            LOGGER.info(collect_system_info())
            return None
        elif a == "version":
            from spectrogram_yolov11_tpu import __version__

            LOGGER.info(__version__)
            return None
        elif a == "settings":
            # `yolo settings [reset | k=v ...]` (reference cfg/__init__.py
            # handle_yolo_settings:700): show / update / reset the PERSISTENT
            # SETTINGS singleton, not the train-cfg defaults
            from spectrogram_yolov11_tpu.utils import SETTINGS

            rest = argv[argv.index(a) + 1 :]
            if rest and rest[0] == "reset":
                SETTINGS.reset()
                LOGGER.info("settings reset to defaults")
            elif rest:
                updates = parse_key_value_pairs([x for x in rest if "=" in x])
                unknown = set(updates) - set(SETTINGS)
                if unknown:
                    raise SyntaxError(f"unknown settings key(s) {sorted(unknown)}; valid: {sorted(SETTINGS)}")
                SETTINGS.update(updates)
                SETTINGS.save()
            LOGGER.info("\n".join(f"{k}={v}" for k, v in SETTINGS.items()) + f"\n\nsettings saved at {SETTINGS.file}")
            return None
        elif a == "cfg":
            # print the packaged default cfg yaml (reference: yaml_print(DEFAULT_CFG_PATH))
            LOGGER.info(DEFAULT_CFG_PATH.read_text())
            return None
        elif a == "copy-cfg":
            # copy default.yaml next to the user for editing (reference copy_default_cfg:788)
            dst = Path.cwd() / DEFAULT_CFG_PATH.name.replace(".yaml", "_copy.yaml")
            shutil.copy2(DEFAULT_CFG_PATH, dst)
            LOGGER.info(f"{DEFAULT_CFG_PATH} copied to {dst}\nExample: yolo cfg={dst} imgsz=320 batch=8")
            return None
        elif a in {"hub", "login", "logout"}:
            # `yolo hub login [key] | yolo hub logout | yolo login | yolo logout`
            # (reference handle_yolo_hub:673) against the local registry
            from spectrogram_yolov11_tpu import hub

            rest = argv[argv.index(a) + 1 :] if a == "hub" else [a] + argv[argv.index(a) + 1 :]
            verb = rest[0] if rest else "login"
            if verb == "login":
                hub.login(rest[1] if len(rest) > 1 else None)
            elif verb == "logout":
                hub.logout()
            else:
                raise SyntaxError(f"'{verb}' is not a hub command (login/logout)")
            return None
        elif a == "serve":
            # `yolo serve model=best.ckpt [port=8000 host=0.0.0.0]` — KServe-v2
            # inference server (serve.py); TPU-native counterpart of deploying
            # behind Triton (reference utils/triton.py)
            skv = parse_key_value_pairs([x for x in argv if "=" in x])
            from spectrogram_yolov11_tpu.serve import serve as _serve

            return _serve(
                skv.get("model") or DEFAULT_CFG.model or "yolo11n.yaml",
                host=str(skv.get("host", "127.0.0.1")),
                port=int(skv.get("port", 8000)),
                block=bool(skv.get("block", True)),
                data_parallel=bool(skv.get("data_parallel", False)),
                half=bool(skv.get("half", False)),
                model_parallel=int(skv.get("model_parallel", 1)),
            )
        elif a == "solutions":
            # `yolo solutions <Name> source=... [k=v...]` (reference cfg/__init__.py
            # handle_yolo_solutions): run a turnkey app over a source
            return _run_solution(argv[argv.index(a) + 1 :])
        elif a.startswith("cfg="):
            overrides.update(yaml_load(a.split("=", 1)[1]))
        elif "=" in a:
            kv.append(a)
        else:
            raise SyntaxError(f"'{a}' is not a valid argument.\n{CLI_HELP_MSG}")
    overrides.update(parse_key_value_pairs(kv))
    check_dict_alignment({**DEFAULT_CFG_DICT, "task": task, "mode": mode}, overrides)

    mode = mode or overrides.pop("mode", None) or DEFAULT_CFG.mode or "predict"
    task = task or overrides.pop("task", None)
    model = overrides.pop("model", DEFAULT_CFG.model) or TASK2MODEL.get(task or "detect")

    from spectrogram_yolov11_tpu import YOLO

    m = YOLO(model, task=task)
    if mode in {"train", "val"} and "data" not in overrides and not getattr(m, "ckpt_data", None):
        overrides["data"] = TASK2DATA.get(m.task or "detect")
        LOGGER.warning(f"WARNING: 'data' argument missing, using default {overrides['data']}")
    return getattr(m, mode)(**overrides)


def find_model_yaml(name: str | Path) -> Path:
    """Resolve a model yaml name like 'yolo11n.yaml' -> packaged cfg path, handling scale suffixes."""
    import re

    p = Path(name)
    if p.exists():
        return p
    stem = p.stem
    # strip trailing scale char: yolo11n -> yolo11 (scale 'n')
    unified = re.sub(r"(\d+)([nslmx])([-_]|$)", r"\1\3", stem)
    here = Path(__file__).parent / "models"
    for cand in (stem, unified):
        hits = sorted(here.rglob(f"{cand}.yaml"))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"Model yaml '{name}' not found under {here}")


def find_dataset_yaml(name: str | Path) -> Path:
    """Resolve a dataset yaml name -> packaged cfg/datasets path or user path."""
    p = Path(name)
    if p.exists():
        return p
    hit = Path(__file__).parent / "datasets" / p.name
    if hit.exists():
        return hit
    raise FileNotFoundError(f"Dataset yaml '{name}' not found (looked at {hit})")
