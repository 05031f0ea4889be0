from . import client_cache, fusion_ops, server, transport, wire  # noqa: F401
