"""Serve a .gspnx artifact over a socket (the deployment runtime).

The serving host needs ONLY this script, the artifact and the
checkpoints — the pipeline config is reconstructed from the artifact's
own manifest (gspn_tpu/serve/runtime.py):

    python scripts/serve_gspnx.py --artifact model.gspnx \
        --gspn-ckpt runs/s1/ckpt --rpointnet-ckpt runs/s2/ckpt \
        --socket /tmp/gspn.sock            # or: --port 7447 (loopback)

    # any client process:
    from gspn_tpu.serve import Client
    with Client("/tmp/gspn.sock") as c:    # or Client(("host", 7447))
        out = c.predict(xyz)               # dict of numpy arrays

Requests of any batch size are padded/chunked to the artifact's
compiled batch size by the session; the wire format is length-prefixed
npz (runtime.py docstring).

The protocol carries NO authentication: bind unix sockets or loopback/
trusted-network interfaces only (the default --host is 127.0.0.1).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="serve a .gspnx artifact")
    p.add_argument("--artifact", required=True)
    p.add_argument("--gspn-ckpt", default=None)
    p.add_argument("--rpointnet-ckpt", default=None)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--socket", default=None, help="unix-domain socket path")
    g.add_argument("--port", type=int, default=None, help="TCP port")
    p.add_argument("--host", default="127.0.0.1")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from gspn_tpu.serve import Server, session_from_checkpoints

    session = session_from_checkpoints(
        args.artifact, args.gspn_ckpt, args.rpointnet_ckpt
    )
    address = args.socket if args.socket else (args.host, args.port)
    server = Server(session, address).start()
    print(
        f"serving {args.artifact} "
        f"(batch={session.batch_size}, n_points={session.num_points}, "
        f"platforms={session.manifest['platforms']}) on {server.address}",
        flush=True,
    )
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
