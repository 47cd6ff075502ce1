"""Runtime: JSON-RPC server, CLI, Python client, setup-file IO."""
