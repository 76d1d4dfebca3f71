"""Application entry point.

With Eel installed + a frontend directory, serves the websocket UI exactly
like the reference shell expects (it scrapes stdout for the server line,
reference: main.js:87). Headless, it loads the project, starts the workers,
and keeps pumping until interrupted — the mode used for server/TPU-pod
deployments where the UI runs elsewhere.

    python -m cbas_tpu.app.main --project /path/to/project [--frontend dir] [--port N]
"""

from __future__ import annotations

import argparse
import sys
import time

from cbas_tpu.app.api import Api, bind_eel, bridge_callbacks_to_eel
from cbas_tpu.utils.logging import log_message


def find_available_port(start: int = 8000) -> int:
    import socket

    for port in range(start, start + 200):
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
            try:
                s.bind(("localhost", port))
                return port
            except OSError:
                continue
    raise RuntimeError("no available port")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--project", default=None, help="project directory to open")
    parser.add_argument("--frontend", default="frontend", help="frontend asset dir")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--headless", action="store_true")
    args = parser.parse_args(argv)

    from cbas_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    api = Api()
    if args.project:
        result = api.load_project(args.project)
        if not result.get("success"):
            log_message(f"Could not load project: {result.get('message')}", "ERROR")
            sys.exit(1)

    use_eel = False
    if not args.headless:
        try:
            import eel

            eel.init(args.frontend)
            bind_eel(api)
            bridge_callbacks_to_eel(api)
            use_eel = True
        except Exception as e:
            log_message(f"Eel unavailable ({e}); running headless.", "WARN")

    if use_eel:
        import eel

        port = args.port or find_available_port()
        print(f"Eel server starting on http://localhost:{port}")
        eel.start("index.html", port=port, block=True)
    else:
        # Built-in JSON-RPC + SSE server with the embedded control panel.
        from cbas_tpu.app.server import RpcServer

        import os

        server = RpcServer(
            api,
            port=args.port or 0,
            frontend_dir=args.frontend if os.path.isdir(args.frontend) else None,
        )
        port = server.start()
        print(f"Eel server starting on http://localhost:{port}")  # shell contract
        try:
            while not api.state.shutdown.is_set():
                time.sleep(1.0)
        except KeyboardInterrupt:
            pass
        finally:
            server.stop()
            api.kill_all_processes()


if __name__ == "__main__":
    main()
