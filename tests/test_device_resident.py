"""Device-resident epochs (data/device.py): batch-for-batch equivalence with
the host BatchIterable pipeline — same permutation stream, same padding
semantics, same trained parameters."""

import jax
import numpy as np

from scenario_wise_rec_tpu.core import DenseFeature, SequenceFeature, SparseFeature
from scenario_wise_rec_tpu.data.dataset import BatchIterable, ColumnarDataset
from scenario_wise_rec_tpu.data.device import DeviceResidentLoader
from scenario_wise_rec_tpu.models import MMOE
from scenario_wise_rec_tpu.train import CTRTrainer

FEATS = (
    [SparseFeature(f"s{i}", vocab_size=40, embed_dim=8) for i in range(3)]
    + [SequenceFeature("seq", vocab_size=40, embed_dim=8, pooling="mean",
                       shared_with="s0")]
    + [DenseFeature("d0")]
)


def _data(n=100, seed=3):
    rng = np.random.default_rng(seed)
    x = {f"s{i}": rng.integers(0, 40, n).astype(np.int64) for i in range(3)}
    x["seq"] = rng.integers(0, 40, (n, 4)).astype(np.int64)
    x["d0"] = rng.normal(size=n).astype(np.float32)
    x["domain_indicator"] = rng.integers(0, 2, n).astype(np.int64)
    y = rng.integers(0, 2, n).astype(np.float32)
    return ColumnarDataset(x, y)


def _trainer(scan_steps):
    model = MMOE(FEATS, 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    return CTRTrainer(model, seed=11, scan_steps=scan_steps,
                      prefetch_depth=0)


def test_epoch_perm_matches_batchiterable():
    ds = _data()
    host = BatchIterable(ds, 16, shuffle=True, seed=5)
    res = DeviceResidentLoader(ds, 16, seed=5)
    assert len(host) == len(res) == 7
    for _ in range(2):  # two epochs advance the same stream
        host_batches = list(host)
        perm, w = res.epoch_perm()
        for bi, (xb, yb, wb) in enumerate(host_batches):
            sel = perm[bi * 16:(bi + 1) * 16]
            np.testing.assert_array_equal(wb, w[bi * 16:(bi + 1) * 16])
            for kk, v in xb.items():
                np.testing.assert_array_equal(v, ds.x[kk][sel])
            np.testing.assert_array_equal(yb, ds.y[sel])


def test_resident_training_matches_host_training():
    """Full scanned dispatches + a remainder that includes the padded final
    batch: identical parameters after two epochs."""
    ds = _data()
    th = _trainer(scan_steps=3)
    tr = _trainer(scan_steps=3)
    host = BatchIterable(ds, 16, shuffle=True, seed=5)     # 7 batches
    res = DeviceResidentLoader(ds, 16, seed=5)             # 2 scans + 1 rem
    for _ in range(2):
        th.train_one_epoch(host, log_interval=10**9)
        tr.train_one_epoch(res, log_interval=10**9)
    hl = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(th.params)}
    rl = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(tr.params)}
    assert set(hl) == set(rl)
    for kk, v in rl.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(hl[kk]),
                                   rtol=1e-6, atol=1e-7, err_msg=kk)
    # BN running stats advanced identically too
    for (ps, vh), (_, vr) in zip(
            jax.tree_util.tree_leaves_with_path(th.state),
            jax.tree_util.tree_leaves_with_path(tr.state)):
        np.testing.assert_allclose(np.asarray(vr), np.asarray(vh),
                                   rtol=1e-6, atol=1e-7, err_msg=str(ps))


def test_resident_training_sparse_mode():
    """Resident epochs compose with the sparse embedding-update path."""
    ds = _data(64)
    model = MMOE(FEATS, 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    tr = CTRTrainer(model, seed=1, scan_steps=2, prefetch_depth=0,
                    sparse_embedding_updates=True,
                    sparse_update_impl="occurrence")
    res = DeviceResidentLoader(ds, 16, seed=2)
    tr.train_one_epoch(res, log_interval=10**9)
    # one epoch trains without error and comb moved
    comb = np.asarray(tr.opt_state["emb"]["comb"])
    assert np.abs(comb[:, 8:]).sum() > 0  # moment columns moved


def test_resident_training_on_mesh_matches_single_device():
    """The resident scan under a (data, embed) mesh: column matrices
    replicated, permutation sharded on the batch axis — same training as
    the single-device resident run."""
    from scenario_wise_rec_tpu.parallel.mesh import make_mesh

    ds = _data(96)

    def run(mesh):
        model = MMOE(FEATS, 2, n_expert=2, expert_params={"dims": [16]},
                     tower_params={"dims": [8]})
        tr = CTRTrainer(model, seed=11, scan_steps=2, prefetch_depth=0,
                        mesh=mesh)
        res = DeviceResidentLoader(ds, 16, seed=5)
        tr.train_one_epoch(res, log_interval=10**9)
        return tr.params

    p1 = run(None)
    p2 = run(make_mesh(n_data=4, n_embed=2))
    # 6 sharded optimizer steps amplify the psum-vs-serial reduction-order
    # noise through Adam's rsqrt; the existing mesh e2e tests use the same
    # looseness (tests/test_parallel.py:161-166)
    for (kp, v1), (_, v2) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p1),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p2),
                   key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   atol=1e-3, err_msg=str(kp))


def test_fit_accepts_resident_loader(tmp_path):
    ds = _data(64)
    model = MMOE(FEATS, 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    tr = CTRTrainer(model, seed=1, scan_steps=2, n_epoch=1,
                    prefetch_depth=0, model_path=str(tmp_path))
    res = DeviceResidentLoader(ds, 16, seed=2)
    val = BatchIterable(_data(32, seed=9), 16)
    tr.fit(res, val)  # epoch + eval + checkpoint write


def test_resident_gather_dispatch_matches_step():
    """resident_gather='dispatch' (one [S*B]-row gather per dispatch) is
    numerically identical to the per-step gather formulation."""
    ds = _data()
    model_kw = dict(n_expert=2, expert_params={"dims": [16]},
                    tower_params={"dims": [8]})
    ts = CTRTrainer(MMOE(FEATS, 2, **model_kw), seed=11, scan_steps=3,
                    prefetch_depth=0, resident_gather="step")
    td = CTRTrainer(MMOE(FEATS, 2, **model_kw), seed=11, scan_steps=3,
                    prefetch_depth=0, resident_gather="dispatch")
    for tr in (ts, td):
        loader = DeviceResidentLoader(ds, 16, seed=5)
        for _ in range(2):
            tr.train_one_epoch(loader, log_interval=10**9)
    for (p, vs), (_, vd) in zip(
            jax.tree_util.tree_leaves_with_path(ts.params),
            jax.tree_util.tree_leaves_with_path(td.params)):
        np.testing.assert_allclose(np.asarray(vd), np.asarray(vs),
                                   rtol=1e-6, atol=1e-7, err_msg=str(p))


def test_device_shuffle_epoch_ids_cover_dataset():
    """device_shuffle mode: the on-device epoch ids are a permutation of
    the dataset rows plus BatchIterable's repeat-first-row padding."""
    n, b, s = 100, 16, 3
    nb = (n + b - 1) // b          # 7 batches
    n_disp = nb // s               # 2 scanned dispatches
    ids_all, tail = CTRTrainer._device_epoch_ids(
        np.uint32(123), n, b, s, n_disp, True)
    assert ids_all.shape == (n_disp, s, b)
    flat = np.concatenate([np.asarray(ids_all).ravel(),
                           np.asarray(tail).ravel()])
    assert flat.shape[0] == nb * b
    # first n positions of the padded stream hold every row once
    rem = n % b
    pad = b - rem
    assert sorted(flat[:n + pad].tolist()) == sorted(
        list(range(n)) + [flat[n - rem]] * pad)
    # padded tail repeats the final partial batch's first row
    assert np.all(flat[-pad:] == flat[n - rem])


def test_device_shuffle_training_runs_and_covers_rows():
    """device_shuffle training smoke: two full epochs (scanned dispatches
    + the padded remainder batch) run, params move and stay finite. The
    permutation/padding semantics themselves are pinned by
    test_device_shuffle_epoch_ids_cover_dataset; batch-exact equivalence
    with the host pipeline is NOT claimed (the jax.random shuffle stream
    is a documented deviation, README ledger)."""
    ds = _data()
    model = MMOE(FEATS, 2, n_expert=2, expert_params={"dims": [16]},
                 tower_params={"dims": [8]})
    tr = CTRTrainer(model, seed=11, scan_steps=3, prefetch_depth=0)
    res = DeviceResidentLoader(ds, 16, seed=5, device_shuffle=True)
    p0 = np.asarray(tr._params_for_eval()["embedding"]["packed"]).copy()
    for _ in range(2):
        tr.train_one_epoch(res, log_interval=10**9)
    tr.barrier()
    p1 = np.asarray(tr._params_for_eval()["embedding"]["packed"])
    assert not np.array_equal(p0, p1), "params did not move"
    assert np.isfinite(p1).all()
