"""Test doubles shipped with the framework.

- ``fake_mongo``: in-memory pymongo/bson-compatible shim so the MongoDB
  storage backend (rgnir_tpu.store.mongo) can be exercised — contract
  tests, CI, local development — without a MongoDB server or even
  pymongo installed.
- ``fake_streamlit``: headless ``st`` API shim + AppHarness so the
  Streamlit app (rgnir_tpu.app.streamlit_app) can be driven and
  asserted on without the streamlit package.
- ``selftest``: the on-device kernel parity sweep behind
  ``rgnir-tpu selftest``.
"""

from rgnir_tpu.testing import fake_mongo, fake_streamlit

__all__ = ["fake_mongo", "fake_streamlit", "selftest"]
