"""Batched scene-generation service (new TPU-native capability).

The reference has no serving path — generation only exists inside its eval
script.  This module turns the jitted sampling program into a request/response
service suitable for production batch- or online-serving:

  * requests are plain dicts: object class names + named relationship triples
    (the user-facing form of a scene graph),
  * requests are micro-batched into ONE padded flat graph batch per call
    (shapes are static per CollateSpec bucket, so the sampler jits once),
  * responses carry descaled world-unit boxes per object and optionally the
    generated SDF grids or marching-tetrahedra meshes.

The vocabulary (class list, predicate list, box-normalization stats, CLIP
text features) comes from the same dataset root the model was trained on.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..core.boxes import descale_box_params
from ..data.clip_text import ClipTextEncoder
from ..data.sgfront import SceneExample


def request_to_example(req: Dict[str, Any], classes: Dict[str, int],
                       rel_dict: Dict[str, int], clip: ClipTextEncoder,
                       use_scene_rels: bool = True,
                       request_id: str = "request") -> SceneExample:
    """Build a SceneExample from a user request.

    req = {"objects": ["bed", "wardrobe", ...],
           "triples": [[0, "left", 1], ...]}          (predicate by name)

    Mirrors the dataset's graph construction (data/sgfront.py:_load_scene):
    scene root node appended with 'in' edges, CLIP text features per node and
    per relation phrase.
    """
    names = [str(o) for o in req.get("objects", [])]
    if not names:
        raise ValueError(f"request {req.get('id', request_id)!r}: "
                         "'objects' must be a non-empty list")
    if not use_scene_rels and not req.get("triples"):
        raise ValueError(f"request {req.get('id', request_id)!r}: at least "
                         "one triple required without scene-root edges")
    unknown = [n for n in names if n not in classes]
    if unknown:
        raise KeyError(f"unknown object classes {unknown}; "
                       f"known: {sorted(classes)[:8]}...")
    cat_ids = [classes[n] for n in names]
    triples: List[List[int]] = []
    words: List[str] = []
    for s, p, o in req.get("triples", []):
        s, o = int(s), int(o)
        if not (0 <= s < len(names) and 0 <= o < len(names)):
            raise IndexError(f"triple ({s},{p},{o}) out of range")
        if p not in rel_dict:
            raise KeyError(f"unknown predicate {p!r}; known: {sorted(rel_dict)}")
        triples.append([s, rel_dict[p], o])
        words.append(f"{names[s]} {p} {names[o]}")
    node_texts = list(names)
    if use_scene_rels:
        scene_idx = len(cat_ids)
        for i, nm in enumerate(names):
            triples.append([i, 0, scene_idx])
            words.append(f"{nm} in room")
        cat_ids.append(0)
        node_texts.append("room")
    n, t = len(cat_ids), len(triples)
    tri = np.asarray(triples, np.int32)
    return SceneExample(
        scan_id=str(req.get("id", request_id)),
        objs=np.asarray(cat_ids, np.int32),
        objs_grained=np.asarray(cat_ids, np.int32),
        triples=tri,
        boxes=np.full((n, 7), -1.0, np.float32),   # no GT at serve time
        text_feats=clip.encode_many(node_texts),
        rel_feats=clip.encode_many(words),
        enc_triples=tri.copy(),
        enc_rel_feats=clip.encode_many(words),
        enc_node_mask=np.ones(n, np.float32),
        enc_triple_mask=np.ones(t, np.float32),
        change_flags=np.zeros(n, np.float32),
        manipulation_type="none",
    )


class GenerationService:
    """Owns the jitted sampler and turns request dicts into scene outputs."""

    def __init__(self, sg, state, spec, stats, classes: Dict[str, int],
                 rel_dict: Dict[str, int],
                 clip: Optional[ClipTextEncoder] = None,
                 gen_shape: bool = True, return_meshes: bool = False,
                 use_scene_rels: bool = True, seed: int = 0):
        import jax
        self.sg = sg
        self.state = state
        self.spec = spec
        self.stats = stats
        self.classes = classes
        self.rel_dict = rel_dict
        self.clip = clip or ClipTextEncoder("hash")
        self.gen_shape = gen_shape
        self.return_meshes = return_meshes
        self.use_scene_rels = use_scene_rels
        self._key = jax.random.PRNGKey(seed)
        self._sample = jax.jit(lambda p, bs, b, k: sg.sample_fn(
            p, bs, b, k, gen_shape=gen_shape))

    # ------------------------------------------------------------------
    def _scene_result(self, ex: SceneExample, out_slice) -> Dict[str, Any]:
        n_real = ex.num_nodes - (1 if self.use_scene_rels else 0)
        boxes6 = descale_box_params(
            np.concatenate([out_slice["sizes"], out_slice["translations"]],
                           -1), self.stats)
        res: Dict[str, Any] = {
            "id": ex.scan_id,
            "sizes": boxes6[:n_real, :3].tolist(),
            "translations": boxes6[:n_real, 3:6].tolist(),
            "angles": out_slice["angles"][:n_real, 0].tolist(),
        }
        shapes = out_slice.get("shapes")
        if shapes is not None:
            sdfs = np.asarray(shapes[:n_real, ..., 0], np.float32)
            if self.return_meshes:
                from ..eval.render import sdf_to_canonical_mesh, fit_verts_to_box
                meshes = []
                for i in range(n_real):
                    verts, faces = sdf_to_canonical_mesh(sdfs[i])
                    if len(verts):
                        box7 = np.concatenate(
                            [boxes6[i], [out_slice["angles"][i, 0]]])
                        verts = fit_verts_to_box(verts, box7)
                    meshes.append({"vertices": np.asarray(verts).tolist(),
                                   "faces": np.asarray(faces).tolist()})
                res["meshes"] = meshes
            else:
                res["sdf_shape"] = list(sdfs.shape)
                res["sdfs"] = sdfs.tolist()
        return res

    def generate(self, requests: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """Micro-batch the requests into padded generation calls."""
        import jax
        from ..data.collate import collate_scenes

        examples = [request_to_example(
            r, self.classes, self.rel_dict, self.clip,
            use_scene_rels=self.use_scene_rels, request_id=f"req{i}")
            for i, r in enumerate(requests)]
        # validate EVERYTHING before the first (expensive) generation call so
        # a malformed request fails fast instead of discarding finished work
        for e in examples:
            if (e.num_nodes > self.spec.max_nodes
                    or len(e.triples) > self.spec.max_triples):
                raise ValueError(
                    f"request {e.scan_id} exceeds capacity "
                    f"({e.num_nodes} nodes / {len(e.triples)} triples vs "
                    f"{self.spec.max_nodes}/{self.spec.max_triples})")
        results: List[Optional[Dict[str, Any]]] = [None] * len(examples)

        idx = 0
        while idx < len(examples):
            group, gidx, nn, tt = [], [], 0, 0
            while idx < len(examples):
                e = examples[idx]
                if (group and (nn + e.num_nodes > self.spec.max_nodes
                               or tt + len(e.triples) > self.spec.max_triples
                               or len(group) >= self.spec.max_scenes)):
                    break
                group.append(e)
                gidx.append(idx)
                nn += e.num_nodes
                tt += len(e.triples)
                idx += 1
            batch = collate_scenes(group, self.spec)
            self._key, sk = jax.random.split(self._key)
            out = self._sample(self.state.params, self.state.batch_stats,
                               batch, sk)
            out_np = {k: np.asarray(v) for k, v in out.items()}
            off = 0
            for e, i in zip(group, gidx):
                n = e.num_nodes
                sl = {k: v[off:off + n] for k, v in out_np.items()}
                results[i] = self._scene_result(e, sl)
                off += n
        return [r for r in results if r is not None]


def service_from_experiment(exp: str, dataset: Optional[str] = None,
                            epoch: int = -1, gen_shape: bool = True,
                            return_meshes: bool = False,
                            max_nodes: int = 48, max_triples: int = 160,
                            max_scenes: int = 8,
                            sample_dtype: Optional[str] = None,
                            layout_sampler: Optional[str] = None,
                            layout_steps: int = 0,
                            shape_sampler: Optional[str] = None,
                            shape_steps: int = 0) -> GenerationService:
    """Rebuild the model from an experiment dir (args.json contract, same as
    eval.cli) and wrap it in a GenerationService."""
    import json
    import os

    import jax

    from ..data.collate import CollateSpec, collate_scenes
    from ..data.sgfront import SGFrontDataset
    from ..models.config import load_config
    from ..models.sgdiff import SGDiff
    from ..train.checkpoint import restore_checkpoint

    with open(os.path.join(exp, "args.json")) as f:
        margs = json.load(f)
    clip = ClipTextEncoder(margs.get("clip_backend", "hash"))
    ds = SGFrontDataset(
        root=dataset or margs["dataset"], split="test",
        room_type=margs["room_type"], shuffle_objs=False, use_sdf=False,
        use_scene_rels=margs["use_scene_rels"], with_changes=False,
        large=margs["large"], clip=clip, seed=0,
        sdf_res=margs.get("sdf_res", 64))
    cfg = load_config(margs["diff_yaml"], network_type=margs["network_type"],
                      with_clip=margs["with_CLIP"])
    cfg.replace_latent = margs["replace_latent"]
    cfg.residual = margs["residual"]
    cfg.layout_diffusion.train_stats_file = ds.box_stats_path
    if sample_dtype:
        cfg.sample_dtype = sample_dtype
    if layout_sampler:
        cfg.layout_diffusion.sampler = layout_sampler
    if layout_steps:
        cfg.layout_diffusion.sample_steps = layout_steps
    if shape_sampler:
        cfg.shape_branch.sampler = shape_sampler
    if shape_steps:
        cfg.shape_branch.ddim_steps = shape_steps

    spec = CollateSpec(max_nodes=max_nodes, max_triples=max_triples,
                       max_scenes=max_scenes, diffusion_bs=max_nodes,
                       with_sdf=False)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names),
                iou_stats=ds.box_stats)
    ex0 = next(e for e in (ds[i] for i in range(len(ds))) if e is not None)
    state = sg.init(jax.random.PRNGKey(0), collate_scenes([ex0], spec))
    if epoch >= 0:
        state = restore_checkpoint(
            os.path.join(exp, "checkpoint", f"model{epoch}"), state)
    return GenerationService(sg, state, spec, ds.box_stats, ds.classes,
                             ds.rel_dict, clip=clip, gen_shape=gen_shape,
                             return_meshes=return_meshes,
                             use_scene_rels=margs["use_scene_rels"])
