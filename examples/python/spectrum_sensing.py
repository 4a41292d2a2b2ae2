"""End-to-end spectrum sensing: raw IQ capture -> on-device STFT -> LTE/RF
detections -> per-band occupancy report.

    python examples/python/spectrum_sensing.py capture.npy --model best.ckpt
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture", nargs="?", help=".npy complex64 IQ file (synthesized if omitted)")
    ap.add_argument("--model", default="spectrogram_yolo11.yaml")
    ap.add_argument("--n-fft", type=int, default=256)
    ap.add_argument("--hop", type=int, default=128)
    args = ap.parse_args()

    if args.capture:
        iq = np.load(args.capture).astype(np.complex64)
    else:
        from spectrogram_yolov11_tpu.data.synth import _synth_iq

        iq, events = _synth_iq(np.random.default_rng(0), args.n_fft + args.hop * 639)
        print(f"synthesized capture with {len(events)} bursts")

    from spectrogram_yolov11_tpu.solutions import SpectrumMonitor

    monitor = SpectrumMonitor(model=args.model, n_fft=args.n_fft, hop=args.hop)
    annotated, reports = monitor(iq)
    for r in reports:
        f0, f1 = r["freq_band"]
        t0, t1 = r["time_span"]
        print(f"{r['class']:>4}  conf {r['conf']:.2f}  freq [{f0:.3f}, {f1:.3f}]  time [{t0:.3f}, {t1:.3f}]")
    import cv2

    cv2.imwrite("spectrum_detections.jpg", annotated)
    print("annotated waterfall -> spectrum_detections.jpg")


if __name__ == "__main__":
    main()
