#!/usr/bin/env python
"""Gradio web app entry point (reference app.py at the repo root).

Thin wrapper over vampnet_tpu.serve.app: loads the default models (HF hub or
local models/vampnet/*), builds the UI + named API, and launches.
"""
from vampnet_tpu.serve.app import main

if __name__ == "__main__":
    main()
