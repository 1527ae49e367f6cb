"""Generation service: request parsing, micro-batching, HTTP round trip."""
import json
import threading
import urllib.request

import numpy as np
import jax
import pytest
# Full-model jit compiles make this module multi-minute on one CPU
# core; excluded from the fast default selection (pytest.ini addopts).
pytestmark = pytest.mark.slow


from echoscene_tpu.serve.service import GenerationService, request_to_example
from echoscene_tpu.data.clip_text import ClipTextEncoder


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.data.collate import collate_scenes, CollateSpec
    from echoscene_tpu.models.sgdiff import SGDiff
    from tests.test_end_to_end import tiny_config

    root = tmp_path_factory.mktemp("serve")
    make_fake_dataset(str(root), num_scenes=3, min_objs=3, max_objs=4,
                      sdf_res=16, with_sdf=True)
    ds = SGFrontDataset(str(root), use_sdf=True, with_changes=False, seed=1,
                        sdf_res=16)
    cfg = tiny_config()
    spec = CollateSpec(max_nodes=cfg.max_nodes, max_triples=cfg.max_triples,
                       max_scenes=4, diffusion_bs=cfg.diffusion_bs,
                       with_sdf=False)
    batch = collate_scenes([ds[0]], spec)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names))
    state = sg.init(jax.random.PRNGKey(0), batch)
    return GenerationService(sg, state, spec, ds.box_stats, ds.classes,
                             ds.rel_dict, gen_shape=True), ds


def _request(ds, idx=0):
    names = [n for n in ds.classes if n != "_scene_"][:3]
    preds = list(ds.rel_dict)
    return {"objects": names,
            "triples": [[0, preds[0], 1], [1, preds[-1], 2]],
            "id": f"q{idx}"}


def test_request_to_example_structure(service):
    svc, ds = service
    ex = request_to_example(_request(ds), ds.classes, ds.rel_dict,
                            ClipTextEncoder("hash"))
    assert ex.num_nodes == 4                 # 3 objects + scene root
    assert ex.triples.shape == (2 + 3, 3)    # 2 user + 3 'in' edges
    assert ex.text_feats.shape == (4, 512)


def test_request_errors(service):
    svc, ds = service
    clip = ClipTextEncoder("hash")
    with pytest.raises(KeyError):
        request_to_example({"objects": ["no_such_class"]},
                           ds.classes, ds.rel_dict, clip)
    with pytest.raises(KeyError):
        request_to_example({"objects": list(ds.classes)[:2],
                            "triples": [[0, "no_such_rel", 1]]},
                           ds.classes, ds.rel_dict, clip)
    with pytest.raises(ValueError):
        request_to_example({"objects": []}, ds.classes, ds.rel_dict, clip)
    with pytest.raises(ValueError):
        request_to_example({"objects": list(ds.classes)[:2]},
                           ds.classes, ds.rel_dict, clip,
                           use_scene_rels=False)


def test_generate_validates_all_before_running(service):
    """One oversize request fails the whole call BEFORE any generation."""
    svc, ds = service
    big = {"objects": [n for n in ds.classes if n != "_scene_"] * 20,
           "triples": [], "id": "big"}
    with pytest.raises((ValueError, KeyError)):
        svc.generate([_request(ds, 0), big])


def test_generate_batches_and_descale(service):
    svc, ds = service
    results = svc.generate([_request(ds, 0), _request(ds, 1)])
    assert len(results) == 2
    for r in results:
        assert len(r["sizes"]) == 3          # scene root stripped
        assert len(r["angles"]) == 3
        assert np.isfinite(np.asarray(r["sizes"])).all()
        assert "sdfs" in r and r["sdf_shape"][0] == 3


def test_result_format_arrays_and_meshes(service):
    """arrays mode returns numpy payloads (no .tolist() marshaling) and the
    mesh mode emits welded indexed meshes fitted to the predicted boxes."""
    svc, ds = service
    arr_svc = GenerationService(svc.sg, svc.state, svc.spec, svc.stats,
                                svc.classes, svc.rel_dict, clip=svc.clip,
                                gen_shape=True, return_meshes=True,
                                result_format="arrays")
    (r,) = arr_svc.generate([_request(ds, 0)])
    assert len(r["meshes"]) == 3
    for m in r["meshes"]:
        assert isinstance(m["vertices"], np.ndarray)
        assert m["vertices"].dtype == np.float32
        assert isinstance(m["faces"], np.ndarray) and m["faces"].dtype == np.int32
        if len(m["faces"]):
            # welded: indexed into a shared (deduplicated) vertex buffer
            assert m["faces"].max() < len(m["vertices"])
            assert len(m["vertices"]) < 3 * len(m["faces"])
    json_svc = GenerationService(svc.sg, svc.state, svc.spec, svc.stats,
                                 svc.classes, svc.rel_dict, clip=svc.clip,
                                 gen_shape=True, result_format="arrays")
    (r,) = json_svc.generate([_request(ds, 0)])
    assert isinstance(r["sdfs"], np.ndarray) and r["sdfs"].dtype == np.float32
    with pytest.raises(ValueError):
        GenerationService(svc.sg, svc.state, svc.spec, svc.stats, svc.classes,
                          svc.rel_dict, result_format="msgpack")


def test_manipulation_addition_keeps_untouched(service):
    """generate -> add a node against the previous response: untouched
    objects' boxes are spliced from the previous result (keep mask honored,
    EchoScene.py:465-471 / eval_3dfront.py:192-202)."""
    svc, ds = service
    names = [n for n in ds.classes if n != "_scene_"]
    preds = list(ds.rel_dict)
    base = svc.generate([_request(ds, 20)])[0]
    follow = {"previous": base["id"], "id": "q21",
              "manipulation": {"type": "addition", "object": names[0],
                               "triples": [[-1, preds[0], 0]]}}
    out = svc.generate([follow])[0]
    assert out["manipulation"] == "addition"
    n_base = len(base["sizes"])
    assert len(out["sizes"]) == n_base + 1
    assert out["keep"][:n_base] == [1.0] * n_base
    assert out["keep"][n_base] == 0.0
    for j in range(n_base):
        assert out["sizes"][j] == base["sizes"][j]
        assert out["translations"][j] == base["translations"][j]
        assert out["angles"][j] == base["angles"][j]
    # the added node got fresh, finite predictions
    assert np.isfinite(out["sizes"][n_base]).all()


def test_manipulation_relationship_resamples_endpoints(service):
    svc, ds = service
    preds = [p for p in ds.rel_dict if ds.rel_dict[p] != 0]
    base_req = _request(ds, 30)
    base = svc.generate([base_req])[0]
    new_pred = next(p for p in preds if p != base_req["triples"][0][1])
    follow = {"previous": base["id"], "id": "q31",
              "manipulation": {"type": "relationship", "index": 0,
                               "predicate": new_pred}}
    out = svc.generate([follow])[0]
    assert out["manipulation"] == "relationship"
    s, _, o = base_req["triples"][0]
    assert out["keep"][s] == 0.0 and out["keep"][o] == 0.0
    untouched = [j for j in range(len(base["sizes"])) if j not in (s, o)]
    for j in untouched:
        assert out["sizes"][j] == base["sizes"][j]


def test_manipulation_unknown_previous_raises(service):
    svc, ds = service
    with pytest.raises(KeyError):
        svc.generate([{"previous": "nope",
                       "manipulation": {"type": "relationship", "index": 0,
                                        "predicate": "left"}}])


def test_http_round_trip(service):
    from echoscene_tpu.serve.cli import run_http

    svc, ds = service
    port = 18931
    t = threading.Thread(target=run_http, args=(svc, "127.0.0.1", port),
                         daemon=True)
    t.start()
    import time
    payload = json.dumps([_request(ds, 7)]).encode()
    for attempt in range(30):
        try:
            resp = urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=payload,
                headers={"Content-Type": "application/json"}), timeout=120)
            break
        except (ConnectionError, urllib.error.URLError):
            time.sleep(1)
    body = json.loads(resp.read())
    assert len(body["results"]) == 1
    assert body["results"][0]["id"] == "q7"

    # malformed request -> 400 with an error message
    bad = json.dumps([{"objects": ["nope"]}]).encode()
    try:
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=bad), timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
        assert "error" in json.loads(e.read())
    assert raised


def test_microbatcher_coalesces_and_isolates(service):
    """Concurrent submits coalesce into shared dispatches; a malformed
    request fails alone (individual retry), not its batch neighbors."""
    from echoscene_tpu.serve.batcher import MicroBatcher

    svc, ds = service
    mb = MicroBatcher(svc, max_wait_ms=250.0)
    try:
        futs = [mb.submit(_request(ds, 100 + i)) for i in range(4)]
        results = [f.result(timeout=600) for f in futs]
        assert [r["id"] for r in results] == [f"q{100 + i}" for i in range(4)]
        st = mb.stats()
        assert st["requests"] == 4
        # 4 submits landed while the worker waited out one window -> fewer
        # dispatches than requests
        assert st["batches"] < 4
        assert st["mean_batch_size"] > 1.0

        # one bad request among good ones: only the bad future raises
        good1 = mb.submit(_request(ds, 200))
        bad = mb.submit({"objects": ["not-a-class"], "triples": [],
                         "id": "qbad"})
        good2 = mb.submit(_request(ds, 201))
        assert good1.result(timeout=600)["id"] == "q200"
        assert good2.result(timeout=600)["id"] == "q201"
        with pytest.raises(KeyError):
            bad.result(timeout=600)
        assert mb.stats()["isolated_failures"] >= 1
    finally:
        mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(_request(ds, 300))


def test_dp_serving_two_devices(service):
    """dp_devices=2: micro-batches from one generate() call spread over a
    2-device ('data',) mesh; results align positionally and per-scene output
    structure matches the single-chip path."""
    svc, ds = service
    assert len(jax.devices()) >= 2
    dp_svc = GenerationService(svc.sg, svc.state, svc.spec, svc.stats,
                               svc.classes, svc.rel_dict, clip=svc.clip,
                               gen_shape=True, dp_devices=2)
    # 5 requests of 4 nodes on a max_scenes=4 bucket -> 2 groups -> one
    # 2-shard dp dispatch plus nothing left over
    reqs = [_request(ds, 400 + i) for i in range(5)]
    results = dp_svc.generate(reqs)
    assert [r["id"] for r in results] == [f"q{400 + i}" for i in range(5)]
    ref = svc.generate([_request(ds, 410)])[0]
    for r in results:
        assert len(r["sizes"]) == len(ref["sizes"])
        assert np.isfinite(np.asarray(r["sizes"])).all()
        assert np.isfinite(np.asarray(r["sdfs"])).all()

    # manipulation flows through the dp path too (keep mask + splice)
    follow = {"previous": results[0]["id"], "id": "q420",
              "manipulation": {"type": "addition",
                               "object": [n for n in ds.classes
                                          if n != "_scene_"][0],
                               "triples": [[-1, list(ds.rel_dict)[0], 0]]}}
    out = dp_svc.generate([follow])[0]
    n_base = len(results[0]["sizes"])
    assert out["keep"][:n_base] == [1.0] * n_base
    for j in range(n_base):
        assert out["sizes"][j] == results[0]["sizes"][j]

    with pytest.raises(ValueError):
        GenerationService(svc.sg, svc.state, svc.spec, svc.stats, svc.classes,
                          svc.rel_dict, dp_devices=512)


def test_warmup_precompiles_no_request_compiles(service):
    """After warmup with a row-bucket ladder, mixed-size requests never add a
    compiled variant (the cold-compile-inside-a-request cliff is gone)."""
    svc, ds = service
    warm = GenerationService(svc.sg, svc.state, svc.spec, svc.stats,
                             svc.classes, svc.rel_dict, gen_shape=True,
                             row_buckets=(4, 8))
    n = warm.warmup(manips=(False,), verbose=False)
    assert n >= 2
    before = set(warm.compiled_variants())
    # mixed sizes: 1-object, 2-object, 3-object requests hit different raw
    # row counts but pin to the warmed buckets
    names = [n_ for n_ in ds.classes if n_ != "_scene_"][:3]
    preds = list(ds.rel_dict)
    reqs = [{"objects": names[:k], "id": f"m{k}",
             "triples": [[0, preds[0], k - 1]] if k > 1 else []}
            for k in (1, 2, 3)]
    out = warm.generate(reqs)
    assert len(out) == 3 and all(r is not None for r in out)
    assert set(warm.compiled_variants()) == before, \
        "a request triggered a compile after warmup"


def test_row_buckets_pin_rows(service):
    svc, ds = service
    bucketed = GenerationService(svc.sg, svc.state, svc.spec, svc.stats,
                                 svc.classes, svc.rel_dict, gen_shape=True,
                                 row_buckets=(4, 8))
    from echoscene_tpu.data.collate import collate_scenes
    ex = request_to_example(_request(ds), bucketed.classes, bucketed.rel_dict,
                            bucketed.clip)
    b = collate_scenes([ex], bucketed.spec)
    # 4 real nodes -> bucket 4; an unbucketed service gives the same here but
    # 5-7 nodes would pin to 8 instead of 8 (multiple-of-4 coincide) — check
    # the cap path: a raw count above the top bucket pins to max_nodes
    assert bucketed._rows(b) in (4, 8, bucketed.spec.max_nodes)
    assert bucketed.row_buckets[-1] == bucketed.spec.max_nodes


def test_microbatcher_close_strands_no_futures(service):
    """close() must fail queued-but-unserved futures instead of hanging
    clients (ADVICE r4: stranded futures + unbounded result waits)."""
    from echoscene_tpu.serve.batcher import MicroBatcher

    class SlowService:
        spec = type("S", (), {"max_scenes": 4})()

        def generate(self, reqs):
            import time
            time.sleep(0.3)
            return [{"id": r.get("id")} for r in reqs]

    mb = MicroBatcher(SlowService(), max_wait_ms=5.0)
    f1 = mb.submit({"id": "a"})          # picked up by the worker
    import time
    time.sleep(0.05)                     # let the worker enter generate()
    f2 = mb.submit({"id": "b"})          # queued behind the in-flight batch
    mb.close(timeout=5.0)
    # the in-flight request finishes; anything still queued fails fast
    assert f1.result(timeout=5.0)["id"] == "a"
    done2 = f2.done()
    if done2 and f2.exception() is None:
        assert f2.result()["id"] == "b"  # worker drained it before exiting
    else:
        with pytest.raises(RuntimeError):
            f2.result(timeout=1.0)
    # post-close submissions never hang either
    with pytest.raises(RuntimeError):
        mb.submit({"id": "c"})


def test_dp_warmup_precompiles(service):
    """warmup() on a dp service AOT-compiles the shard_map sampler ladder;
    requests after warmup add no variants."""
    svc, ds = service
    dp_svc = GenerationService(svc.sg, svc.state, svc.spec, svc.stats,
                               svc.classes, svc.rel_dict, clip=svc.clip,
                               gen_shape=True, dp_devices=2,
                               row_buckets=(8,))
    n = dp_svc.warmup(manips=(False,), verbose=False)
    assert n >= 1
    before = set(dp_svc.compiled_variants())
    assert before, "dp warmup compiled nothing"
    reqs = [_request(ds, 500 + i) for i in range(3)]
    results = dp_svc.generate(reqs)
    assert len(results) == 3 and all(r is not None for r in results)
    assert set(dp_svc.compiled_variants()) == before
