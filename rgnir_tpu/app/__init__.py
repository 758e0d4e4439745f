"""L6 UI: Streamlit app (import-gated — streamlit may be absent).

Run with:  streamlit run rgnir_tpu/app/streamlit_app.py
"""
