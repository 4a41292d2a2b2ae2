"""Streamlit real-time inference GUI (reference: solutions/streamlit_inference.py:14).

Availability-gated like every optional integration in this build: the web UI
needs the streamlit package (absent from the TPU image), but the frame loop
is factored into `Inference.process_frame` so the exact code path the GUI
drives is testable headlessly (tests/test_solutions.py).

Usage (where streamlit exists):
    streamlit run spectrogram_yolov11_tpu/solutions/streamlit_inference.py -- yolo11n.yaml
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

from spectrogram_yolov11_tpu.utils import LOGGER


class Inference:
    """Real-time detection/tracking app over the YOLO facade.

    Mirrors the reference surface: web_ui/sidebar/source_upload/configure/
    inference for the streamlit path; process_frame carries the per-frame
    logic shared with headless use.
    """

    def __init__(self, model: Optional[str] = None, **kwargs: Any):
        self.source = None
        self.enable_trk = False
        self.conf = 0.25
        self.iou = 0.45
        self.selected_ind: List[int] = []
        self.model = None
        self.model_path = model or "yolo11n.yaml"
        self.st = None
        LOGGER.info(f"Solutions: Inference {dict(model=self.model_path, **kwargs)}")

    # -- shared frame loop ----------------------------------------------------

    def load_model(self):
        from spectrogram_yolov11_tpu.engine.model import YOLO

        self.model = YOLO(self.model_path)
        return list(getattr(self.model, "names", {}).values() or [])

    def process_frame(self, frame: np.ndarray):
        """One frame -> (annotated frame, results); tracking when enabled."""
        kw = dict(conf=self.conf, iou=self.iou, verbose=False)
        if self.selected_ind:
            kw["classes"] = self.selected_ind
        if self.enable_trk:
            results = self.model.track(frame, persist=True, **kw)
        else:
            results = self.model.predict(frame, **kw)
        r = results[0]
        return r.plot(), r

    def run_headless(self, frames) -> list:
        """Drive the same loop the GUI uses over an iterable of BGR frames."""
        if self.model is None:
            self.load_model()
        return [self.process_frame(f) for f in frames]

    # -- streamlit UI (gated) -------------------------------------------------

    def web_ui(self):
        self.st.set_page_config(page_title="spectrogram_yolov11_tpu", layout="wide")
        self.st.markdown("<h1 style='text-align:center'>TPU YOLO Streamlit App</h1>", unsafe_allow_html=True)

    def sidebar(self):
        self.st.sidebar.title("User Configuration")
        self.source = self.st.sidebar.selectbox("Video", ("webcam", "video"))
        self.enable_trk = self.st.sidebar.radio("Enable Tracking", ("Yes", "No")) == "Yes"
        self.conf = float(self.st.sidebar.slider("Confidence Threshold", 0.0, 1.0, self.conf, 0.01))
        self.iou = float(self.st.sidebar.slider("IoU Threshold", 0.0, 1.0, self.iou, 0.01))
        col1, col2 = self.st.columns(2)
        self.org_frame = col1.empty()
        self.ann_frame = col2.empty()

    def source_upload(self):
        self.vid_file_name = 0
        if self.source == "video":
            f = self.st.sidebar.file_uploader("Upload Video File", type=["mp4", "mov", "avi", "mkv"])
            if f is not None:
                import io

                with open("upload.mp4", "wb") as out:
                    out.write(io.BytesIO(f.read()).read())
                self.vid_file_name = "upload.mp4"

    def configure(self):
        names = self.load_model()
        selected = self.st.sidebar.multiselect("Classes", names, default=names[:3])
        self.selected_ind = [names.index(x) for x in selected]

    def inference(self):
        """Full streamlit app loop (requires the streamlit package)."""
        import streamlit as st  # gated: ImportError here = GUI unavailable

        import cv2

        self.st = st
        self.web_ui()
        self.sidebar()
        self.source_upload()
        self.configure()
        if self.st.sidebar.button("Start"):
            stop = self.st.button("Stop")
            cap = cv2.VideoCapture(self.vid_file_name)
            if not cap.isOpened():
                self.st.error("Could not open source.")
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok:
                    break
                annotated, _ = self.process_frame(frame)
                if stop:
                    cap.release()
                    self.st.stop()
                self.org_frame.image(frame, channels="BGR")
                self.ann_frame.image(annotated, channels="BGR")
            cap.release()


if __name__ == "__main__":
    import sys

    Inference(model=sys.argv[1] if len(sys.argv) > 1 else None).inference()
