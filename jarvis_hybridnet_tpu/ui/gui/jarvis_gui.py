"""Streamlit GUI (browser dashboard).

Equivalent of the reference GUI (jarvis/ui/gui/jarvis_gui.py and siblings):
project create/load sidebar plus Training / Prediction / Analysis pages
wired to the same interface functions as the CLIs. Run via
``jarvis launch`` or ``streamlit run jarvis_gui.py``. Requires streamlit
(not bundled in minimal environments; the CLI reports this cleanly).
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "..")
)

import streamlit as st

from jarvis_hybridnet_tpu.config import ProjectManager
from jarvis_hybridnet_tpu.training import train_interface
from jarvis_hybridnet_tpu.utils.param_classes import (
    Predict2DParams,
    Predict3DParams,
)


def main():
    st.set_page_config(page_title="JARVIS TPU", layout="wide")
    st.sidebar.title("JARVIS (TPU edition)")

    pm = ProjectManager()
    projects = pm.get_projects()
    page = st.sidebar.radio(
        "Menu", ["Project", "Training", "Prediction", "Analysis"])

    if page == "Project":
        st.header("Create a new project")
        name = st.text_input("Project name")
        d3d = st.text_input("3D dataset path")
        d2d = st.text_input("2D dataset path (defaults to 3D)")
        if st.button("Create") and name:
            ok = pm.create_new(name, d2d or d3d, d3d or None)
            (st.success if ok else st.error)(
                "Project created." if ok else "Creation failed.")
        st.header("Existing projects")
        st.write(projects)

    elif page == "Training":
        st.header("Training")
        project = st.selectbox("Project", projects)
        network = st.selectbox(
            "Network", ["All", "CenterDetect", "KeypointDetect", "HybridNet"])
        epochs = st.number_input("Epochs (0 = config default)", 0, 1000, 0)
        if st.button("Start training") and project:
            n = int(epochs) or None
            bar = st.progress(0.0)
            widgets = [bar]
            if network in ("All", "CenterDetect"):
                train_interface.train_efficienttrack(
                    "CenterDetect", project, n, None,
                    streamlit_widgets=widgets)
            if network in ("All", "KeypointDetect"):
                train_interface.train_efficienttrack(
                    "KeypointDetect", project, n, None,
                    streamlit_widgets=widgets)
            if network in ("All", "HybridNet"):
                train_interface.train_hybridnet(
                    project, n, "latest", None, "3D_only",
                    streamlit_widgets=widgets)
            st.success("Training finished.")

    elif page == "Prediction":
        st.header("Prediction")
        project = st.selectbox("Project", projects)
        mode = st.selectbox("Mode", ["predict3D", "predict2D"])
        rec = st.text_input("Recording path")
        frame_start = st.number_input("Start frame", 0)
        number_frames = st.number_input("Number of frames (-1 = all)", -1)
        if st.button("Run prediction") and project and rec:
            bar = st.progress(0.0)
            if mode == "predict3D":
                from jarvis_hybridnet_tpu.prediction.predict3d import (
                    predict3D,
                )

                params = Predict3DParams(project, rec)
                params.frame_start = int(frame_start)
                params.number_frames = int(number_frames)
                params.progress_bar = bar
                out = predict3D(params)
            else:
                from jarvis_hybridnet_tpu.prediction.predict2d import (
                    predict2D,
                )

                params = Predict2DParams(project, rec)
                params.frame_start = int(frame_start)
                params.number_frames = int(number_frames)
                params.progress_bar = bar
                out = predict2D(params)
            st.success(f"Predictions written to {out}")

    elif page == "Analysis":
        st.header("Validation analysis")
        project = st.selectbox("Project", projects)
        if st.button("Analyze validation data") and project:
            from jarvis_hybridnet_tpu.analysis.analyze import (
                analyze_validation_data,
            )

            bar = st.progress(0.0)
            out = analyze_validation_data(project, progress_bar=bar)
            st.success(f"Analysis written to {out}")
            from jarvis_hybridnet_tpu.analysis.plotting import (
                plot_error_histogram,
            )

            st.pyplot(plot_error_histogram(out, interactive=False))


if __name__ == "__main__":
    main()
