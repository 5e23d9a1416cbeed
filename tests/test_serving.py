"""Serving-runtime tests (gspn_tpu/serve/runtime.py).

The deployment story must hold end-to-end on the wire: a session built
from the artifact's own manifest (config reconstruction, no model
code), batch padding/chunking hygiene, and the socket server/client
round trip — all bit-identical to the live fused pipeline. CPU backend.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gspn_tpu.data import synthetic
from gspn_tpu.models.pipeline import init_pipeline_variables, make_inference_fn
from gspn_tpu.serve import (
    Client,
    InferenceSession,
    Server,
    export_inference,
    pipeline_config_from_manifest,
    save_artifact,
    session_from_checkpoints,
)
from tests.test_pipeline_eval import TINY

B, N = 2, 192
_FIELDS = ("masks", "scores", "classes", "boxes", "valid")


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), N)
    exported = export_inference(TINY, variables, N, batch_size=B)
    path = save_artifact(
        tmp_path_factory.mktemp("serve") / "tiny.gspnx", exported, TINY
    )
    return path, variables


def _scenes(rng, b):
    batch = synthetic.scene_batch(
        rng, b, n_points=N, max_instances=3, extent=2.0
    )
    return batch["xyz"], batch["valid"]


def _live(variables, xyz, valid, key):
    out = jax.jit(make_inference_fn(TINY))(
        variables, jnp.asarray(xyz), None, jnp.asarray(valid), key
    )
    return {f: np.asarray(getattr(out, f)) for f in _FIELDS}


def test_manifest_config_roundtrip(artifact):
    path, _ = artifact
    from gspn_tpu.serve.export import load_artifact

    _, manifest = load_artifact(path)
    cfg = pipeline_config_from_manifest(manifest)
    # full dataclass equality: every nested field (tuples, specs, dtypes)
    # survives the JSON round trip. The exporter pinned ops_impl="xla"
    # for the cpu-only artifact, so compare against that.
    expect = dataclasses.replace(
        TINY,
        gspn=dataclasses.replace(TINY.gspn, ops_impl="xla"),
        rpointnet=dataclasses.replace(TINY.rpointnet, ops_impl="xla"),
    )
    assert cfg == expect


def test_session_exact_and_padding(artifact, rng):
    path, variables = artifact
    session = InferenceSession(path, variables)
    assert (session.batch_size, session.num_points) == (B, N)
    assert not session.has_features

    # full batch: bit-identical to the live pipeline
    xyz, valid = _scenes(rng, B)
    live = _live(variables, xyz, valid, jax.random.fold_in(
        jax.random.PRNGKey(0), 0))
    got = session.predict(xyz, valid, seed=0)
    for f in _FIELDS:
        np.testing.assert_array_equal(got[f], live[f], err_msg=f)

    # short batch (b=1 < compiled B=2): padded by replication, padding
    # rows dropped — row 0 must equal the full-batch row 0 of a padded
    # call made directly
    got1 = session.predict(xyz[:1], valid[:1], seed=0)
    assert all(got1[f].shape[0] == 1 for f in _FIELDS)
    pad_xyz = np.concatenate([xyz[:1], xyz[:1]])
    pad_valid = np.concatenate([valid[:1], valid[:1]])
    ref = _live(variables, pad_xyz, pad_valid,
                jax.random.fold_in(jax.random.PRNGKey(0), 0))
    for f in _FIELDS:
        np.testing.assert_array_equal(got1[f], ref[f][:1], err_msg=f)


def test_session_chunks_oversized_batch(artifact, rng):
    path, variables = artifact
    session = InferenceSession(path, variables)
    xyz, valid = _scenes(rng, 2 * B + 1)  # 2 full chunks + 1 padded
    got = session.predict(xyz, valid, seed=3)
    assert all(got[f].shape[0] == 2 * B + 1 for f in _FIELDS)
    # chunk i runs under fold_in(seed, i): check each chunk vs live
    for ci in range(2):
        lo = ci * B
        live = _live(variables, xyz[lo:lo + B], valid[lo:lo + B],
                     jax.random.fold_in(jax.random.PRNGKey(3), ci))
        for f in _FIELDS:
            np.testing.assert_array_equal(
                got[f][lo:lo + B], live[f], err_msg=f"{f} chunk {ci}"
            )


def test_session_input_validation(artifact, rng):
    path, variables = artifact
    session = InferenceSession(path, variables)
    with pytest.raises(ValueError, match="n_points"):
        session.predict(np.zeros((1, N + 8, 3), np.float32))
    with pytest.raises(ValueError, match="without features"):
        session.predict(
            np.zeros((1, N, 3), np.float32),
            features=np.zeros((1, N, 4), np.float32),
        )
    with pytest.raises(ValueError, match=r"valid must be"):
        session.predict(
            np.zeros((1, N, 3), np.float32), valid=np.ones((2, N), bool)
        )


def test_session_from_checkpoints_restores(artifact, tmp_path, rng):
    """Manifest-only session construction + checkpoint restore: the
    session must produce the TRAINED variables' outputs, not init's."""
    path, _ = artifact
    from gspn_tpu.train.checkpoint import CheckpointManager

    # fabricate a "trained" stage-1: perturb params, save as a ckpt
    variables = init_pipeline_variables(TINY, jax.random.PRNGKey(0), N)
    trained_gspn = jax.tree.map(lambda x: x + 0.01, variables["gspn"])
    mgr = CheckpointManager(tmp_path / "s1")
    mgr.save(1, {
        "params": trained_gspn["params"],
        "batch_stats": trained_gspn.get("batch_stats", {}),
    }, force=True)
    mgr.close()

    session = session_from_checkpoints(path, gspn_ckpt=tmp_path / "s1")
    xyz, valid = _scenes(rng, B)
    got = session.predict(xyz, valid, seed=0)

    expect_vars = dict(variables)
    expect_vars["gspn"] = jax.tree.map(
        lambda a, b: b, variables["gspn"], trained_gspn
    )
    live = _live(expect_vars, xyz, valid,
                 jax.random.fold_in(jax.random.PRNGKey(0), 0))
    for f in _FIELDS:
        np.testing.assert_array_equal(got[f], live[f], err_msg=f)


def test_server_round_trip_unix_socket(artifact, rng, tmp_path):
    path, variables = artifact
    session = InferenceSession(path, variables)
    xyz, valid = _scenes(rng, B)
    live = _live(variables, xyz, valid,
                 jax.random.fold_in(jax.random.PRNGKey(0), 0))

    sock = tmp_path / "gspn.sock"
    with Server(session, sock), Client(sock) as client:
        got = client.predict(xyz, valid, seed=0)
        for f in _FIELDS:
            np.testing.assert_array_equal(got[f], live[f], err_msg=f)
        # second request on the same connection (sequencing works)
        got1 = client.predict(xyz[:1], valid[:1])
        assert got1["masks"].shape[0] == 1
        # an invalid request errors on that frame but keeps the
        # connection serving
        with pytest.raises(RuntimeError, match="n_points"):
            client.predict(np.zeros((1, N + 8, 3), np.float32))
        got2 = client.predict(xyz, valid, seed=0)
        np.testing.assert_array_equal(got2["masks"], live["masks"])
    assert not sock.exists()  # stop() cleans up the socket file


def test_predict_rejects_empty_batch(artifact):
    """b=0 fails up front with a clear message, not deep in concatenate
    (ADVICE r3)."""
    path, variables = artifact
    session = InferenceSession(path, variables)
    with pytest.raises(ValueError, match="at least one scene"):
        session.predict(np.zeros((0, N, 3), np.float32))


def test_client_rejects_stale_frame(artifact, rng, tmp_path):
    """Request correlation (ADVICE r3 medium): a late response frame left
    queued by an earlier (aborted) request must NOT be read as the answer
    to a new request — the id mismatch poisons the client."""
    from gspn_tpu.serve.runtime import _send_msg

    path, variables = artifact
    session = InferenceSession(path, variables)
    xyz, valid = _scenes(rng, B)
    sock = tmp_path / "gspn.sock"
    with Server(session, sock):
        client = Client(sock)
        # simulate an aborted request whose response is still in flight:
        # inject a raw frame with a foreign _rid ahead of the client's
        # own request
        _send_msg(
            client._sock,
            {"xyz": np.asarray(xyz, np.float32), "seed": np.int64(0),
             "_rid": np.int64(99)},
        )
        with pytest.raises(ConnectionError, match="correlation id"):
            client.predict(xyz, valid, seed=0)
        # the client is poisoned: no silent reuse of the dirty stream
        with pytest.raises(ConnectionError, match="new Client"):
            client.predict(xyz, valid, seed=0)
        # a fresh connection works
        with Client(sock) as c2:
            got = c2.predict(xyz, valid, seed=0)
            assert got["masks"].shape[0] == B


def test_server_caps_connections(artifact, rng, tmp_path):
    """Connections beyond max_connections are refused (closed), and the
    refused client raises instead of hanging (ADVICE r3)."""
    import time

    path, variables = artifact
    session = InferenceSession(path, variables)
    xyz, valid = _scenes(rng, B)
    sock = tmp_path / "gspn.sock"
    with Server(session, sock, max_connections=1):
        with Client(sock) as c1:
            assert c1.predict(xyz, valid)["masks"].shape[0] == B
            # second concurrent connection: accepted at socket level,
            # then closed by the server before any frame is served
            c2 = Client(sock)
            time.sleep(0.2)
            with pytest.raises((ConnectionError, OSError)):
                c2.predict(xyz, valid)
        # after c1 disconnects the slot frees up
        deadline = time.monotonic() + 5
        while True:
            try:
                with Client(sock) as c3:
                    assert c3.predict(xyz, valid)["masks"].shape[0] == B
                break
            except (ConnectionError, OSError):
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.1)


def test_server_rejects_oversized_request(artifact, rng, tmp_path):
    """Request frames above the compiled-shape-derived cap close the
    connection instead of allocating (ADVICE r3)."""
    from gspn_tpu.serve.runtime import _HEADER, _MAGIC, _VERSION

    path, variables = artifact
    session = InferenceSession(path, variables)
    sock = tmp_path / "gspn.sock"
    with Server(session, sock, max_request_scenes=1) as srv:
        big = srv.max_request_bytes + 1
        client = Client(sock)
        # claim an oversized payload; server must drop the connection
        client._sock.sendall(_HEADER.pack(_MAGIC, _VERSION, big))
        with pytest.raises((ConnectionError, OSError)):
            client._sock.sendall(b"\0" * (1 << 20))
            resp = client._sock.recv(1)
            if resp == b"":
                raise ConnectionError("closed")


def test_session_from_checkpoints_no_bn_artifact(tmp_path, rng):
    """use_bn=False artifact: init variables carry no batch_stats
    collection; checkpoint restore must not inject one (the exported
    in_tree would no longer match — ADVICE r3)."""
    cfg = dataclasses.replace(
        TINY,
        gspn=dataclasses.replace(TINY.gspn, use_bn=False),
        rpointnet=dataclasses.replace(TINY.rpointnet, use_bn=False),
    )
    variables = init_pipeline_variables(cfg, jax.random.PRNGKey(0), N)
    assert "batch_stats" not in variables["gspn"]
    exported = export_inference(cfg, variables, N, batch_size=1)
    path = save_artifact(tmp_path / "nobn.gspnx", exported, cfg)

    from gspn_tpu.train.checkpoint import CheckpointManager

    trained = jax.tree.map(lambda x: x + 0.01, variables["gspn"])
    mgr = CheckpointManager(tmp_path / "s1")
    mgr.save(1, {"params": trained["params"], "batch_stats": {}}, force=True)
    mgr.close()

    session = session_from_checkpoints(path, gspn_ckpt=tmp_path / "s1")
    assert "batch_stats" not in session.variables["gspn"]
    xyz, valid = _scenes(rng, 1)
    got = session.predict(xyz, valid, seed=0)
    assert got["masks"].shape[0] == 1


def test_server_concurrent_clients(artifact, rng, tmp_path):
    import threading

    path, variables = artifact
    session = InferenceSession(path, variables)
    xyz, valid = _scenes(rng, B)
    live = _live(variables, xyz, valid,
                 jax.random.fold_in(jax.random.PRNGKey(0), 0))
    sock = tmp_path / "gspn.sock"
    results, errors = {}, []

    def _worker(i):
        try:
            with Client(sock) as c:
                results[i] = c.predict(xyz, valid, seed=0)
        except Exception as e:  # surfaced in the main thread
            errors.append(e)

    with Server(session, sock):
        threads = [
            threading.Thread(target=_worker, args=(i,)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert not errors
    assert sorted(results) == [0, 1, 2]
    for i in results:
        np.testing.assert_array_equal(results[i]["masks"], live["masks"])
