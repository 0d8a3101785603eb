"""Execute the analysis notebook headlessly (the reference ships a
JupyterLab evaluation variant, src/gpseval.ipynb; ours must actually
run, including the live-parallel UDP cell)."""

import os

import nbformat
from nbclient import NotebookClient

NB = os.path.join(os.path.dirname(__file__), "..", "examples",
                  "analysis.ipynb")


def test_analysis_notebook_executes():
    nb = nbformat.read(NB, as_version=4)
    client = NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": os.path.dirname(NB)}})
    client.execute()
    # the evaluator cell printed fix statistics and the live-parallel
    # cell consumed epochs off the UDP transport
    text = "\n".join(
        "".join(o.get("text", "")) for c in nb.cells
        if c.cell_type == "code" for o in c.get("outputs", []))
    assert "fixes:" in text
    assert "consumed" in text and "epochs live" in text
