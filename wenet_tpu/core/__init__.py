from . import framing, ldpc_tables, packets  # noqa: F401
