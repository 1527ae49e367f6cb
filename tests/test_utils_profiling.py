"""Utils + profiling helpers."""
import time

import numpy as np

from echoscene_tpu.utils import FreeMemLinux, seed_everything, tensor2im
from echoscene_tpu.train.profiling import StepTimer
from echoscene_tpu.eval.graph_viz import scene_graph_dot


def test_freemem():
    fm = FreeMemLinux("GB")
    assert fm.total > 1
    assert 0 < fm.available <= fm.total


def test_seed_everything_and_tensor2im():
    seed_everything(3)
    a = np.random.rand(2)
    seed_everything(3)
    b = np.random.rand(2)
    assert np.allclose(a, b)
    img = tensor2im(np.linspace(-1, 1, 12).reshape(2, 2, 3))
    assert img.dtype == np.uint8 and img.max() == 255 and img.min() == 0


def test_step_timer():
    t = StepTimer(scenes_per_step=4, window=10)
    t.tick()
    time.sleep(0.01)
    t.tick()
    assert t.step_seconds > 0
    assert t.scenes_per_sec > 0


def test_scene_graph_dot():
    dot = scene_graph_dot([1, 2, 0], np.array([[0, 1, 1], [1, 0, 2]]),
                          ["_scene_\n", "bed\n", "table\n"],
                          ["in\n", "left\n"],
                          changed_nodes=[0], changed_triples=[1])
    assert "digraph" in dot
    assert '"bed"' in dot and '"left"' in dot
    assert "lightcoral" in dot      # changed node highlighted
    assert "color=red" in dot       # changed edge highlighted


def test_load_scene_graphs_yaml(tmp_path):
    """Custom demo-graph yaml loader incl. the reference's manipulation
    semantics (helpers/viz_util.py:5-72): add, in-place relabel, and the
    replace-edge-with-new-pair variant."""
    from echoscene_tpu.eval.graph_viz import (load_scene_graphs_yaml,
                                              loaded_graph_dot)
    yml = tmp_path / "demo.yaml"
    yml.write_text("""
Scenes:
  demo1:
    nodes: [bed, wardrobe, nightstand]
    relships:
      - [0, 1, "left"]
      - [1, 2, "close by"]
    manipulations:
      - ["chair", "add", [[2, "standing on"], [1, "left"]]]
      - ["", "rel", [0, 1, "left", "right"]]
  demo2:
    nodes: [table, chair]
    relships:
      - [0, 1, "front"]
    manipulations:
      - ["", "rel", [0, 1, "front", [1, 0, "behind"]]]
""")
    plain = load_scene_graphs_yaml(str(yml))
    assert plain["demo1"]["objects"] == ["bed", "wardrobe", "nightstand"]
    assert plain["demo1"]["triples"] == [[0, "left", 1], [1, "close by", 2]]
    assert plain["demo1"]["edge_mask"] == [1, 1]

    mani = load_scene_graphs_yaml(str(yml), with_manipulation=True)
    d1 = mani["demo1"]
    assert d1["objects"] == ["bed", "wardrobe", "nightstand", "chair"]
    assert d1["node_mask"] == [1, 1, 1, 0]
    # added edges go FROM the new node; the relabel rewrites edge 0 in place
    assert [3, "standing on", 2] in d1["triples"]
    assert [3, "left", 1] in d1["triples"]
    assert d1["triples"][0] == [0, "left->right", 1]
    assert d1["edge_mask"] == [0, 1, 0, 0]
    # replace-with-new-pair: old (0,1,front) edge deleted, (1,0,behind) added
    d2 = mani["demo2"]
    assert d2["triples"] == [[1, "behind", 0]]
    assert d2["edge_mask"] == [0]

    dot = loaded_graph_dot(d1, title="demo1")
    assert '"chair"' in dot and '"left->right"' in dot
    assert "lightcoral" in dot and "color=red" in dot
