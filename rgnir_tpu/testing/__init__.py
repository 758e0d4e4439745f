"""Test doubles shipped with the framework.

``fake_mongo`` provides an in-memory pymongo/bson-compatible shim so
the MongoDB storage backend (rgnir_tpu.store.mongo) can be exercised —
contract tests, CI, local development — without a MongoDB server or
even pymongo installed.
"""

from rgnir_tpu.testing import fake_mongo

__all__ = ["fake_mongo"]
