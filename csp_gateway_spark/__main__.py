"""CLI entry point (reference: the ``csp-gateway-start`` console script,
``csp-gateway-start --config-dir=... +config=...``):

    python -m csp_gateway_spark --config app.yaml [-o port=8000 ...]

Loads the YAML config, instantiates the gateway, builds the channel
catalog on a SparkSession, and serves the REST/WS surface until
interrupted (``--once`` builds + serves + exits immediately — used by
tests and smoke checks).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="csp-gateway-spark")
    parser.add_argument("--config", required=True, help="YAML config with a gateway entry")
    parser.add_argument(
        "-o",
        "--override",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="dotted-path config override (repeatable)",
    )
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0, help="0 = ephemeral")
    parser.add_argument("--api-key", default=None)
    parser.add_argument("--once", action="store_true", help="build + serve + exit (smoke mode)")
    args = parser.parse_args(argv)

    from csp_gateway_spark.config import load_gateway
    from csp_gateway_spark.serving.app import GatewayApi, GatewayHttpServer
    from csp_gateway_spark.session import get_spark

    gateway = load_gateway(args.config, overrides=args.override)
    spark = get_spark("csp-gateway-spark")
    catalog = gateway.build(spark)
    api = GatewayApi(catalog, api_keys=[args.api_key] if args.api_key else None)
    server = GatewayHttpServer(api, host=args.host, port=args.port)
    server.start()
    print(f"serving on http://{args.host}:{server.port}", flush=True)
    if args.once:
        server.stop()
        gateway.shutdown()
        return 0
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        gateway.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
