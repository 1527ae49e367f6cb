"""GCN correctness: padding invariance + NumPy reference for avg pooling."""
import numpy as np
import jax
import jax.numpy as jnp

from echoscene_tpu.nn.gcn import GraphTripleConv, GraphTripleConvNet, scatter_sum_onehot


def test_scatter_sum_onehot_matches_numpy(rng):
    T, N, D = 11, 6, 4
    vals = rng.normal(size=(T, D)).astype(np.float32)
    idx = rng.integers(0, N, size=(T,))
    mask = (rng.random(T) > 0.3).astype(np.float32)
    out = scatter_sum_onehot(jnp.asarray(vals), jnp.asarray(idx), jnp.asarray(mask), N)
    expect = np.zeros((N, D), np.float32)
    for t in range(T):
        if mask[t]:
            expect[idx[t]] += vals[t]
    assert np.allclose(np.asarray(out), expect, atol=1e-5)


def test_gcn_padding_invariance(rng):
    """Running the same graph with extra padded rows must give identical
    outputs on the real rows (the core guarantee of mask-padded batching)."""
    Do, Dp = 8, 6
    N, T = 5, 7
    pad_n, pad_t = 3, 4
    obj = rng.normal(size=(N, Do)).astype(np.float32)
    pred = rng.normal(size=(T, Dp)).astype(np.float32)
    edges = rng.integers(0, N, size=(T, 2)).astype(np.int32)

    model = GraphTripleConv(input_dim_obj=Do, input_dim_pred=Dp,
                            hidden_dim=16, pooling="avg",
                            mlp_normalization="none", residual=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(obj),
                        jnp.asarray(pred), jnp.asarray(edges))
    out_obj, out_pred = model.apply(params, jnp.asarray(obj), jnp.asarray(pred),
                                    jnp.asarray(edges))

    # padded version: garbage in pad rows, masks zero
    obj_p = np.concatenate([obj, rng.normal(size=(pad_n, Do)).astype(np.float32)])
    pred_p = np.concatenate([pred, rng.normal(size=(pad_t, Dp)).astype(np.float32)])
    edges_p = np.concatenate([edges, rng.integers(0, N + pad_n, size=(pad_t, 2)).astype(np.int32)])
    obj_mask = np.concatenate([np.ones(N), np.zeros(pad_n)]).astype(np.float32)
    tri_mask = np.concatenate([np.ones(T), np.zeros(pad_t)]).astype(np.float32)

    out_obj_p, out_pred_p = model.apply(
        params, jnp.asarray(obj_p), jnp.asarray(pred_p), jnp.asarray(edges_p),
        jnp.asarray(obj_mask), jnp.asarray(tri_mask))

    assert np.allclose(np.asarray(out_obj), np.asarray(out_obj_p[:N]), atol=1e-5)
    assert np.allclose(np.asarray(out_pred), np.asarray(out_pred_p[:T]), atol=1e-5)


def test_gcn_avg_pooling_numpy_reference(rng):
    """net1/net2-free check of the pooling path: with identity-ish params the
    pooled vector must equal the mean of incident messages (clamped count)."""
    Do, Dp, N, T = 4, 3, 4, 5
    obj = rng.normal(size=(N, Do)).astype(np.float32)
    pred = rng.normal(size=(T, Dp)).astype(np.float32)
    edges = np.array([[0, 1], [0, 2], [1, 2], [3, 0], [2, 2]], dtype=np.int32)

    model = GraphTripleConv(input_dim_obj=Do, input_dim_pred=Dp, hidden_dim=8,
                            pooling="avg", residual=False)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(obj),
                        jnp.asarray(pred), jnp.asarray(edges))

    # NumPy re-derivation using the same weights
    p = jax.tree.map(np.asarray, params["params"])
    relu = lambda x: np.maximum(x, 0)

    def mlp(x, sub):
        h = relu(x @ sub["Dense_0"]["kernel"] + sub["Dense_0"]["bias"])
        return relu(h @ sub["Dense_1"]["kernel"] + sub["Dense_1"]["bias"])

    t_in = np.concatenate([obj[edges[:, 0]], pred, obj[edges[:, 1]]], axis=1)
    new_t = mlp(t_in, p["net1"])
    H = 8
    new_s, new_p, new_o = new_t[:, :H], new_t[:, H:H + Dp], new_t[:, H + Dp:]
    pooled = np.zeros((N, H), np.float32)
    counts = np.zeros(N, np.float32)
    for k in range(T):
        pooled[edges[k, 0]] += new_s[k]
        pooled[edges[k, 1]] += new_o[k]
        counts[edges[k, 0]] += 1
        counts[edges[k, 1]] += 1
    pooled /= np.maximum(counts, 1)[:, None]
    expect_obj = mlp(pooled, p["net2"])

    out_obj, out_pred = model.apply(params, jnp.asarray(obj), jnp.asarray(pred),
                                    jnp.asarray(edges))
    assert np.allclose(np.asarray(out_obj), expect_obj, atol=1e-4)
    assert np.allclose(np.asarray(out_pred), new_p, atol=1e-4)


def test_gcn_net_stack_output_dim(rng):
    Do, Dp, N, T = 6, 4, 4, 5
    obj = jnp.asarray(rng.normal(size=(N, Do)).astype(np.float32))
    pred = jnp.asarray(rng.normal(size=(T, Dp)).astype(np.float32))
    edges = jnp.asarray(rng.integers(0, N, size=(T, 2)).astype(np.int32))
    net = GraphTripleConvNet(input_dim_obj=Do, input_dim_pred=Dp, num_layers=3,
                             hidden_dim=8, residual=True, output_dim=10,
                             mlp_normalization="batch")
    vars_ = net.init(jax.random.PRNGKey(0), obj, pred, edges)
    out_obj, out_pred = net.apply(vars_, obj, pred, edges)
    assert out_obj.shape == (N, 10)
    assert out_pred.shape == (T, Dp)

    # train mode mutates batch stats
    out, updates = net.apply(vars_, obj, pred, edges, train=True,
                             mutable=["batch_stats"])
    assert "batch_stats" in updates
