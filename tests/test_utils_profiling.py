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
