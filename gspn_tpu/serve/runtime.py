"""Serving runtime: run a ``.gspnx`` artifact behind a real server.

``serve/export.py`` produces the artifact (StableHLO + manifest);
this module is the host that *runs* it in production:

- :class:`InferenceSession` — loads an artifact + a variables pytree
  (e.g. restored from an Orbax checkpoint) and serves ``predict()``
  with request-size hygiene a raw ``Exported.call`` does not have:
  batches smaller than the compiled batch size are padded (by
  replicating the first scene — semantically safe, rows are dropped on
  return), larger ones are chunked, and all device work is serialized
  behind a lock so one session can serve many threads.
- :func:`session_from_checkpoints` — builds the session from the
  artifact alone: the manifest's embedded pipeline config is
  reconstructed (``train/config_io.config_from_jsonable``), variables
  initialized to the exact exported pytree structure and the stage
  checkpoints restored into it. A serving host needs the artifact +
  checkpoints, no model code paths.
- :class:`Server` / :class:`Client` — a minimal length-prefixed npz
  wire protocol over a unix-domain or TCP socket (framed: magic,
  version, u32 payload length, ``np.savez`` payload). One daemon
  accept-loop, one handler thread per connection (capped by
  ``max_connections``), shared session. Responses echo the request's
  ``_rid`` so a client can never mistake a stale late frame for the
  answer to a retry; any client-side timeout/recv error closes the
  connection (reconnect to retry).

Security model: the protocol carries NO authentication — serve on a
unix socket or a loopback/trusted-network interface only. The server
caps per-frame payloads at a size derived from the artifact's compiled
shape (``max_request_scenes``) and refuses beyond ``max_connections``
concurrent connections.

Replaces: nothing in the reference — it has no serving story at all
(SURVEY.md §1: no serving layer; eval scripts rebuild the TF1 graph
from source every run). This is the rebuild's "large-scale production
deployment and serving" runtime half; the artifact half is export.py.
"""

from __future__ import annotations

import io
import pathlib
import socket
import struct
import threading
from typing import Any

import jax
import numpy as np

from gspn_tpu.serve.export import load_artifact

_MAGIC = b"GSPN"
_VERSION = 2  # v2: response frames echo the request's _rid (clients
#               REQUIRE the echo, so mixing v1/v2 peers must fail at the
#               version check, not with a misleading correlation error)
_HEADER = struct.Struct(">4sBI")  # magic, version, payload length
# absolute frame ceiling (responses to large chunked batches can be
# big); SERVERS additionally cap requests at a size derived from the
# compiled shape — see Server.max_request_bytes
_MAX_PAYLOAD = 1 << 31

_OUT_FIELDS = ("masks", "scores", "classes", "boxes", "valid")


# ---------------------------------------------------------------------------
# session


def _pipeline_config_registry() -> dict[str, type]:
    from gspn_tpu.models.gspn import GSPNConfig
    from gspn_tpu.models.pipeline import PipelineConfig
    from gspn_tpu.models.rpointnet import RPointNetConfig, SALayerSpec

    return {
        c.__name__: c
        for c in (PipelineConfig, GSPNConfig, RPointNetConfig, SALayerSpec)
    }


def pipeline_config_from_manifest(manifest: dict):
    """Rebuild the :class:`PipelineConfig` embedded in an artifact
    manifest (written by ``save_artifact`` via ``_to_jsonable``)."""
    from gspn_tpu.train.config_io import config_from_jsonable

    return config_from_jsonable(
        manifest["pipeline_config"], _pipeline_config_registry()
    )


class InferenceSession:
    """A loaded artifact ready to serve.

    ``variables`` must match the pytree structure the artifact was
    exported with (``export_inference`` docs) — typically
    ``init_pipeline_variables(cfg, ...)`` with checkpoints restored
    into it (:func:`session_from_checkpoints` does exactly that).
    """

    def __init__(
        self,
        artifact: str | pathlib.Path,
        variables: Any,
        *,
        loaded: tuple | None = None,  # pre-loaded (exported, manifest)
    ):
        self.exported, self.manifest = (
            loaded if loaded is not None else load_artifact(artifact)
        )
        self.variables = variables
        self._lock = threading.Lock()
        # recover the serving signature from the exported calling
        # convention: in_tree is the (args, kwargs) pytree of
        # (variables, xyz, [features], valid, rng)
        args, _kwargs = jax.tree.unflatten(
            self.exported.in_tree, list(self.exported.in_avals)
        )
        xyz_aval = args[1]
        self.batch_size, self.num_points = int(xyz_aval.shape[0]), int(
            xyz_aval.shape[1]
        )
        self.has_features = len(args) == 5
        self.feature_dim = int(args[2].shape[-1]) if self.has_features else 0

    def predict(
        self,
        xyz: np.ndarray,
        valid: np.ndarray | None = None,
        features: np.ndarray | None = None,
        seed: int = 0,
    ) -> dict[str, np.ndarray]:
        """Run inference on ``xyz (b, n, 3)`` for any ``b >= 1``.

        ``n`` must equal the artifact's compiled point count (serving
        shapes are static by design — re-export for other sizes).
        Returns numpy arrays ``masks/scores/classes/boxes/valid`` with
        leading dim ``b``. ``seed`` feeds the pipeline's proposal
        sampling rng; chunk i of an oversized batch uses
        ``fold_in(seed, i)`` so results are deterministic in (input,
        seed) regardless of chunking.
        """
        xyz = np.asarray(xyz, np.float32)
        if xyz.ndim != 3 or xyz.shape[-1] != 3:
            raise ValueError(f"xyz must be (b, n, 3), got {xyz.shape}")
        b, n = xyz.shape[:2]
        if b < 1:
            raise ValueError("xyz must contain at least one scene (b >= 1)")
        if n != self.num_points:
            raise ValueError(
                f"artifact was exported for n_points={self.num_points}, "
                f"got {n}; re-export for this size"
            )
        if valid is None:
            valid = np.ones((b, n), bool)
        valid = np.asarray(valid, bool)
        if valid.shape != (b, n):
            raise ValueError(f"valid must be {(b, n)}, got {valid.shape}")
        if self.has_features:
            if features is None:
                raise ValueError(
                    f"artifact expects features (feature_dim="
                    f"{self.feature_dim})"
                )
            features = np.asarray(features, np.float32)
            if features.shape != (b, n, self.feature_dim):
                raise ValueError(
                    f"features must be {(b, n, self.feature_dim)}, got "
                    f"{features.shape}"
                )
        elif features is not None:
            raise ValueError("artifact was exported without features")

        outs: list[dict[str, np.ndarray]] = []
        bs = self.batch_size
        for ci, lo in enumerate(range(0, b, bs)):
            hi = min(lo + bs, b)
            take = hi - lo
            pad = bs - take

            def _prep(a):
                chunk = a[lo:hi]
                if pad:
                    # replicate the first scene into the padding rows:
                    # always a well-formed scene (an all-invalid padding
                    # row would be a degenerate input the pipeline never
                    # sees in training); padded outputs are dropped.
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[:1], pad, axis=0)]
                    )
                return chunk

            key = jax.random.fold_in(jax.random.PRNGKey(seed), ci)
            call_args = [self.variables, _prep(xyz)]
            if self.has_features:
                call_args.append(_prep(features))
            call_args += [_prep(valid), key]
            with self._lock:
                preds = self.exported.call(*call_args)
            outs.append(
                {
                    f: np.asarray(getattr(preds, f))[:take]
                    for f in _OUT_FIELDS
                }
            )
        return {
            f: np.concatenate([o[f] for o in outs], axis=0)
            for f in _OUT_FIELDS
        }


def session_from_checkpoints(
    artifact: str | pathlib.Path,
    gspn_ckpt: str | None = None,
    rpointnet_ckpt: str | None = None,
) -> InferenceSession:
    """Build a ready session from the artifact's own manifest: rebuild
    the pipeline config, initialize the variables pytree at the exported
    structure, restore the stage checkpoints into it. The artifact is
    read once and shared with the session."""
    loaded = load_artifact(artifact)
    exported, manifest = loaded
    cfg = pipeline_config_from_manifest(manifest)
    from gspn_tpu.models.pipeline import init_pipeline_variables
    from gspn_tpu.train.checkpoint import restore_variable_collections

    args, _kw = jax.tree.unflatten(exported.in_tree, list(exported.in_avals))
    n_points = int(args[1].shape[1])
    fdim = int(args[2].shape[-1]) if len(args) == 5 else 0
    variables = init_pipeline_variables(
        cfg, jax.random.PRNGKey(0), n_points, feature_dim=fdim
    )
    for name, ckpt in (("gspn", gspn_ckpt), ("rpointnet", rpointnet_ckpt)):
        if ckpt:
            restored = restore_variable_collections(ckpt, variables[name])
            # keep exactly the collections the exported structure has:
            # a use_bn=False stage has no batch_stats collection, and
            # injecting one would break the exported in_tree match
            variables[name] = {
                coll: restored[coll] for coll in variables[name]
            }
    return InferenceSession(artifact, variables, loaded=loaded)


# ---------------------------------------------------------------------------
# wire protocol


def _send_msg(sock: socket.socket, arrays: dict[str, np.ndarray]) -> None:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    payload = buf.getvalue()
    sock.sendall(_HEADER.pack(_MAGIC, _VERSION, len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    chunks = []
    while n:
        c = sock.recv(min(n, 1 << 20))
        if not c:
            return None
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _recv_msg(
    sock: socket.socket, max_len: int = _MAX_PAYLOAD
) -> dict[str, np.ndarray] | None:
    head = _recv_exact(sock, _HEADER.size)
    if head is None:
        return None
    magic, version, length = _HEADER.unpack(head)
    if magic != _MAGIC:
        raise ValueError(f"bad frame magic {magic!r}")
    if version != _VERSION:
        raise ValueError(f"unsupported protocol version {version}")
    if length > max_len:
        raise ValueError(f"oversized payload ({length} > {max_len} bytes)")
    payload = _recv_exact(sock, length)
    if payload is None:
        raise ValueError("connection closed mid-frame")
    with np.load(io.BytesIO(payload), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class Server:
    """Threaded socket server around one :class:`InferenceSession`.

    ``address`` is a unix-socket path (str/Path) or a ``(host, port)``
    tuple. Each connection handles a sequence of request frames until
    the client closes; device work is serialized by the session lock.
    Errors in a request produce an ``{"error": <message>}`` response on
    that frame (the connection stays up) — malformed FRAMES close the
    connection.

    The protocol has NO authentication: bind unix sockets or loopback/
    trusted interfaces only. ``max_connections`` caps concurrent handler
    threads (excess connections are closed on accept);
    ``max_request_scenes`` bounds the per-frame request payload at that
    many compiled-shape scenes (derived from the artifact's shapes).
    """

    def __init__(
        self,
        session: InferenceSession,
        address,
        max_connections: int = 16,
        max_request_scenes: int = 1024,
    ):
        self.session = session
        self._conn_sem = threading.BoundedSemaphore(max_connections)
        # npz request upper bound: per scene xyz f32 + features f32 +
        # valid (stored as little as 1 bit/entry, up to i64 by sloppy
        # clients) + container overhead
        per_scene = session.num_points * (
            3 * 4 + session.feature_dim * 4 + 8
        ) + 4096
        self.max_request_bytes = min(
            _MAX_PAYLOAD, max_request_scenes * per_scene + (1 << 20)
        )
        self._unix_path = None
        if isinstance(address, (str, pathlib.Path)):
            self._unix_path = pathlib.Path(address)
            if self._unix_path.exists():
                self._unix_path.unlink()
            self._listener = socket.socket(socket.AF_UNIX)
            self._listener.bind(str(self._unix_path))
        else:
            self._listener = socket.socket(socket.AF_INET)
            self._listener.setsockopt(
                socket.SOL_SOCKET, socket.SO_REUSEADDR, 1
            )
            self._listener.bind(tuple(address))
        self._listener.listen(16)
        self._stop = threading.Event()
        self._accept_thread: threading.Thread | None = None

    @property
    def address(self):
        return (
            str(self._unix_path)
            if self._unix_path
            else self._listener.getsockname()
        )

    def start(self) -> "Server":
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True, name="gspnx-accept"
        )
        self._accept_thread.start()
        return self

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return  # listener closed by stop()
            if not self._conn_sem.acquire(blocking=False):
                conn.close()  # over max_connections: refuse
                continue
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket):
        try:
            with conn:
                while not self._stop.is_set():
                    try:
                        req = _recv_msg(conn, self.max_request_bytes)
                    except (ValueError, OSError):
                        return
                    if req is None:
                        return
                    rid = req.pop("_rid", None)
                    try:
                        out = self.session.predict(
                            req["xyz"],
                            valid=req.get("valid"),
                            features=req.get("features"),
                            seed=int(req.get("seed", 0)),
                        )
                    except Exception as e:  # -> error frame, keep serving
                        out = {"error": np.array(str(e))}
                    if rid is not None:
                        # echo the request id: lets the client reject any
                        # stale frame left queued by an aborted request
                        out["_rid"] = np.asarray(rid)
                    try:
                        _send_msg(conn, out)
                    except OSError:
                        return
        finally:
            self._conn_sem.release()

    def stop(self):
        self._stop.set()
        self._listener.close()
        if self._accept_thread:
            self._accept_thread.join(timeout=5)
        if self._unix_path and self._unix_path.exists():
            self._unix_path.unlink()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class Client:
    """Blocking client for :class:`Server`'s wire protocol.

    Request/response correlation: every request carries a fresh ``_rid``
    which the server echoes back; a mismatched or missing echo (a stale
    frame from an earlier aborted request) is an error. Any timeout or
    transport error POISONS the client — the socket is closed and every
    later call raises ``ConnectionError`` — because after an abort the
    stream may still hold the late response and retrying on the same
    connection could misread it. Reconnect (a new Client) to retry.
    ``timeout`` must cover the server's first-request jit/AOT warmup on
    real hardware (can exceed a minute); default 300 s.
    """

    def __init__(self, address, timeout: float | None = 300.0):
        self._dead = False  # poisoned by a timeout/transport error
        self._closed = False  # user-initiated close()
        self._next_rid = 0
        if isinstance(address, (str, pathlib.Path)):
            self._sock = socket.socket(socket.AF_UNIX)
            self._sock.settimeout(timeout)
            self._sock.connect(str(address))
        else:
            self._sock = socket.create_connection(
                tuple(address), timeout=timeout
            )

    def predict(
        self,
        xyz: np.ndarray,
        valid: np.ndarray | None = None,
        features: np.ndarray | None = None,
        seed: int = 0,
    ) -> dict[str, np.ndarray]:
        if self._closed and not self._dead:
            raise ConnectionError("client is closed; create a new Client")
        if self._dead:
            raise ConnectionError(
                "client connection is closed after a previous "
                "timeout/transport error; create a new Client"
            )
        rid = self._next_rid
        self._next_rid += 1
        req = {"xyz": np.asarray(xyz, np.float32),
               "seed": np.int64(seed),
               "_rid": np.int64(rid)}
        if valid is not None:
            req["valid"] = np.asarray(valid, bool)
        if features is not None:
            req["features"] = np.asarray(features, np.float32)
        try:
            _send_msg(self._sock, req)
            resp = _recv_msg(self._sock)
        except (OSError, ValueError):
            self._poison()
            raise
        if resp is None:
            self._poison()
            raise ConnectionError("server closed the connection")
        if int(resp.pop("_rid", -1)) != rid:
            self._poison()
            raise ConnectionError(
                "response correlation id mismatch (stale frame from an "
                "aborted request); create a new Client"
            )
        if "error" in resp:
            raise RuntimeError(f"server error: {resp['error']}")
        return resp

    def _poison(self):
        """Timeout/transport error: the stream may still hold a late
        response, so the connection must never be reused."""
        self._dead = True
        self._closed = True
        self._sock.close()

    def close(self):
        self._closed = True
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
