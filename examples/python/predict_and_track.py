"""Detection + tracking over a video or image folder.

    python examples/python/predict_and_track.py source/ --model best.ckpt
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("--model", default="yolo11n.yaml")
    ap.add_argument("--tracker", default="botsort.yaml")
    args = ap.parse_args()

    from spectrogram_yolov11_tpu import YOLO

    model = YOLO(args.model)
    results = model.track(args.source, tracker=args.tracker, persist=True)
    for r in results:
        ids = getattr(r, "track_ids", [])
        print(f"{r.path}: {len(r.boxes) if r.boxes else 0} objects, ids {list(ids)}")


if __name__ == "__main__":
    main()
