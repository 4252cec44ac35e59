"""A scriptable in-memory stand-in for the streamlit module.

Widget calls return scripted responses (keyed by label) or sensible
defaults, and every display call is recorded so tests can assert on what
the GUI rendered. Install with :func:`install` BEFORE importing any
``jarvis_hybridnet_tpu.ui.gui`` module.
"""

from __future__ import annotations

import sys
import types


class _Element:
    """st.empty() / st.progress() placeholder with the update methods the
    training monitor protocol uses."""

    def __init__(self, log):
        self._log = log

    def progress(self, v):
        self._log.append(("progress", float(v)))

    def markdown(self, s):
        self._log.append(("markdown", str(s)))

    def line_chart(self, data):
        self._log.append(("line_chart", {k: list(v)
                                         for k, v in dict(data).items()}))

    def write(self, *a):
        self._log.append(("write", a))


class _Container:
    """Context-manager container (columns / form / expander / sidebar)."""

    def __init__(self, st):
        self._st = st

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __getattr__(self, name):
        return getattr(self._st, name)


class FakeStreamlit(types.ModuleType):
    def __init__(self, responses=None):
        super().__init__("streamlit")
        self.responses = dict(responses or {})
        self.log = []
        self.session_state = {}
        self.sidebar = _Container(self)

    # -- scripted inputs ---------------------------------------------------
    def _respond(self, kind, label, default):
        self.log.append((kind, label))
        if label in self.responses:
            return self.responses[label]
        return default

    def radio(self, label, options, **k):
        return self._respond("radio", label, options[0])

    def selectbox(self, label, options, **k):
        options = list(options)
        return self._respond("selectbox", label,
                             options[0] if options else None)

    def text_input(self, label, value="", **k):
        return self._respond("text_input", label, value)

    def number_input(self, label, value=0, **k):
        return self._respond("number_input", label, value)

    def button(self, label, **k):
        return self._respond("button", label, False)

    def form_submit_button(self, label="Submit", **k):
        return self._respond("form_submit_button", label, False)

    def checkbox(self, label, value=False, **k):
        return self._respond("checkbox", label, value)

    def multiselect(self, label, options, default=None, **k):
        return self._respond("multiselect", label,
                             list(default) if default is not None else [])

    # -- layout -------------------------------------------------------------
    def form(self, name, **k):
        return _Container(self)

    def expander(self, label, expanded=False):
        return _Container(self)

    def columns(self, spec):
        n = spec if isinstance(spec, int) else len(spec)
        return [_Container(self) for _ in range(n)]

    # -- display ------------------------------------------------------------
    def empty(self):
        return _Element(self.log)

    def progress(self, v):
        el = _Element(self.log)
        el.progress(v)
        return el

    def _record(kind):  # noqa: N805 — decorator-style factory
        def method(self, *a, **k):
            self.log.append((kind, a[0] if a else None))
        return method

    set_page_config = _record("set_page_config")
    title = _record("title")
    header = _record("header")
    subheader = _record("subheader")
    write = _record("write")
    success = _record("success")
    error = _record("error")
    warning = _record("warning")
    info = _record("info")
    line_chart = _record("line_chart")
    pyplot = _record("pyplot")
    balloons = _record("balloons")
    del _record

    # -- test helpers ---------------------------------------------------------
    def calls(self, kind):
        return [v for k, v in self.log if k == kind]


def install(responses=None) -> FakeStreamlit:
    """Install a fresh fake module and purge cached GUI modules so their
    module-level ``import streamlit as st`` rebinds to it."""
    fake = FakeStreamlit(responses)
    sys.modules["streamlit"] = fake
    for name in list(sys.modules):
        if "jarvis_hybridnet_tpu.ui.gui" in name:
            del sys.modules[name]
    return fake
