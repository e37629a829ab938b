from .zktrie import ZkTrie, verify_proof  # noqa: F401
