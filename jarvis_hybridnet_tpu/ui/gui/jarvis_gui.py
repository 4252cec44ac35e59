"""Streamlit GUI (browser dashboard).

Equivalent of the reference GUI (jarvis/ui/gui/jarvis_gui.py and siblings):
project create/load sidebar plus Training / Prediction / Visualization /
Analysis pages wired to the same interface functions as the CLIs, with
live training monitors (5-widget protocol, utils/st_monitor.py), config
sanity checks, prediction-run pickers and inline result plots. Run via
``jarvis launch`` or ``streamlit run jarvis_gui.py``.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "..")
)

import streamlit as st

from jarvis_hybridnet_tpu.config import ProjectManager


def project_page(pm, projects):
    st.header("Create a new project")
    with st.form("create_project_form"):
        name = st.text_input("Project name")
        d3d = st.text_input("3D dataset path")
        d2d = st.text_input("2D dataset path (defaults to 3D)")
        submitted = st.form_submit_button("Create")
    if submitted and name:
        ok = pm.create_new(name, d2d or d3d, d3d or None)
        (st.success if ok else st.error)(
            "Project created." if ok else "Creation failed.")
    st.header("Existing projects")
    st.write(projects)


def main():
    st.set_page_config(page_title="JARVIS TPU", layout="wide")
    st.sidebar.title("JARVIS (TPU edition)")

    pm = ProjectManager()
    projects = pm.get_projects()
    page = st.sidebar.radio(
        "Menu",
        ["Project", "Training", "Prediction", "Visualization", "Analysis"])

    if page == "Project":
        project_page(pm, projects)
        return

    if not projects:
        st.warning("No projects found — create one on the Project page.")
        return
    project = st.sidebar.selectbox("Project", projects)
    if not pm.load(project):
        st.error(f"Could not load project {project}.")
        return
    cfg = pm.get_cfg()

    if page == "Training":
        from .train_gui import train_gui

        train_gui(project, cfg)
    elif page == "Prediction":
        from .predict_gui import predict_gui

        predict_gui(project, cfg)
    elif page == "Visualization":
        from .visualize_gui import visualize_gui

        visualize_gui(project, cfg)
    elif page == "Analysis":
        from .analyze_gui import analyze_gui

        analyze_gui(project, cfg)


if __name__ == "__main__":
    main()
