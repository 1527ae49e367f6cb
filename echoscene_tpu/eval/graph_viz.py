"""Scene-graph visualization as Graphviz DOT (+ optional rendering).

Behavioral reference: helpers/visualize_graph.py:7-93 — digraph of object
nodes and predicate edges with manipulation highlighting (added nodes /
changed edges in a distinct color).  Emits .dot text (renderable with any
graphviz install); falls back gracefully when the `graphviz` binary is absent.
"""
from __future__ import annotations

import os
import subprocess
from typing import Optional, Sequence

import numpy as np


def scene_graph_dot(objs: Sequence[int], triples: np.ndarray,
                    class_names: Sequence[str], pred_names: Sequence[str],
                    changed_nodes: Optional[Sequence[int]] = None,
                    changed_triples: Optional[Sequence[int]] = None,
                    title: str = "scene") -> str:
    changed_nodes = set(changed_nodes or [])
    changed_triples = set(changed_triples or [])
    lines = [f'digraph "{title}" {{',
             '  rankdir=LR; node [shape=box, style="rounded,filled"];']
    for i, c in enumerate(objs):
        name = class_names[int(c)].rstrip("\n")
        color = "lightcoral" if i in changed_nodes else "lightsteelblue"
        lines.append(f'  n{i} [label="{name}", fillcolor={color}];')
    for k, (s, p, o) in enumerate(np.asarray(triples)):
        pred = pred_names[int(p)].rstrip("\n")
        style = ' color=red penwidth=2' if k in changed_triples else ""
        lines.append(f'  n{int(s)} -> n{int(o)} [label="{pred}"{style}];')
    lines.append("}")
    return "\n".join(lines)


def load_graph_json(path: str):
    """Scene-graph json loader (helpers/viz_util.py:5-114 role): returns
    (objects {id: name}, triples [[s, pred_name, o], ...])."""
    import json
    with open(path) as f:
        data = json.load(f)
    if "scans" in data:   # relationships_*.json format
        scan = data["scans"][0]
        objects = {int(k): v for k, v in scan["objects"].items()}
        triples = [[r[0], r[3], r[1]] for r in scan["relationships"]]
        return objects, triples
    objects = {int(k): v for k, v in data.get("objects", {}).items()}
    triples = data.get("relationships", data.get("triples", []))
    return objects, triples


def save_dot(dot: str, path: str, render_png: bool = True) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(dot)
    if render_png:
        try:
            subprocess.run(["dot", "-Tpng", path, "-o",
                            os.path.splitext(path)[0] + ".png"],
                           check=True, capture_output=True, timeout=30)
        except Exception:
            pass  # graphviz binary optional
