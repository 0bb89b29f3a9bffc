"""Block until the TPU is actually usable, then exec a command.

Relay-attached TPUs can lose their tunnel entirely (the relay process exits
on stdin EOF; observed 2026-08-17 mid-round): every device call then hangs
in the PJRT connect-retry loop.  This helper polls cheaply (TCP connect to
the relay ports), confirms with a REAL bounded device program in a
subprocess (a port can accept while the backend is still broken), and only
then execs the given command.

    python scripts/wait_for_tpu.py -- python scripts/train_long.py ...
"""

import os
import socket
import subprocess
import sys
import time

RELAY_PORTS = (8082, 8083, 8087)
PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "(x @ x).block_until_ready();"
    "print('TPU_OK')"
)


def relay_listening() -> bool:
    for port in RELAY_PORTS:
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def device_works(timeout_s: float = 180.0) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return "TPU_OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    args = sys.argv[1:]
    if args and args[0] == "--":
        args = args[1:]
    if not args:
        print("usage: wait_for_tpu.py -- <command...>", file=sys.stderr)
        raise SystemExit(2)
    t0 = time.time()
    while True:
        if relay_listening():
            print(f"[wait_for_tpu] relay port open after {time.time() - t0:.0f}s; "
                  "probing device", flush=True)
            if device_works():
                print("[wait_for_tpu] device probe ok; starting command", flush=True)
                break
            print("[wait_for_tpu] probe failed; retrying in 60s", flush=True)
        time.sleep(60)
    os.execvp(args[0], args)


if __name__ == "__main__":
    main()
