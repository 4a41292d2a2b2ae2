"""GCPRegions latency picker (reference hub/google/__init__.py:11) and the
RF100Benchmark multi-dataset sweep (reference utils/benchmarks.py:201) —
both redesigned for zero egress: injectable probe / local dataset lists."""

from pathlib import Path


def test_gcp_regions_ranking():
    from spectrogram_yolov11_tpu.hub.google import REGIONS, GCPRegions

    # deterministic fake probe: latency = alphabetical rank of the region name
    order = {r: float(i) for i, r in enumerate(sorted(REGIONS))}
    g = GCPRegions(probe=lambda r: order[r])
    assert set(g.tier1()) | set(g.tier2()) == set(REGIONS)
    assert not set(g.tier1()) & set(g.tier2())

    top = g.lowest_latency(top=3, attempts=2)
    assert [t[0] for t in top] == sorted(REGIONS)[:3]
    region, mean, std, lo, hi = top[0]
    assert mean == lo == hi and std == 0.0

    t1 = g.lowest_latency(top=1, tier=1)
    assert t1[0][0] == sorted(g.tier1())[0]


def test_gcp_regions_unreachable_degrades():
    from spectrogram_yolov11_tpu.hub.google import GCPRegions

    g = GCPRegions(probe=lambda r: float("inf"))
    top = g.lowest_latency(top=2, verbose=True)
    assert len(top) == 2 and top[0][1] == float("inf")


def test_rf100_benchmark_local_suite(tmp_path):
    from spectrogram_yolov11_tpu.engine.model import YOLO
    from spectrogram_yolov11_tpu.utils.benchmarks import RF100Benchmark

    links = tmp_path / "datasets_links.txt"
    links.write_text("# local dataset suite\nshapes128.yaml\n")

    b = RF100Benchmark()
    names, cfgs = b.parse_dataset(str(links))
    assert names == ["shapes128"] and cfgs == [Path("shapes128.yaml")]

    model = YOLO("yolo11n.yaml")
    val_log, eval_log = tmp_path / "val.log", tmp_path / "eval.log"
    map50 = b.evaluate("shapes128.yaml", val_log, eval_log, 0, model=model, imgsz=160)
    assert 0.0 <= map50 <= 1.0
    line = eval_log.read_text().strip()
    assert line.startswith("shapes128: ")
    assert float(line.split(": ")[1]) == map50


def test_rf100_fix_yaml(tmp_path):
    from spectrogram_yolov11_tpu.utils import yaml_load, yaml_save
    from spectrogram_yolov11_tpu.utils.benchmarks import RF100Benchmark

    p = tmp_path / "data.yaml"
    yaml_save(p, {"train": "/abs/train", "val": "/abs/val", "nc": 2, "names": ["a", "b"]})
    RF100Benchmark.fix_yaml(p)
    d = yaml_load(p)
    assert d["train"] == "train/images" and d["val"] == "valid/images" and d["nc"] == 2
