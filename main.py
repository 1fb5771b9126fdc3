#!/usr/bin/env python
"""Serving entry point: uvicorn + the FastAPI app.

The reference's main.py (42 LoC) has a broken ``import FastAPI`` yet is the
Dockerfile CMD; this one actually runs (reference main.py:3, Dockerfile:29).
"""

from geoguessr_ai_tpu.serving.api import create_app

app = None


def main() -> None:
    global app
    import uvicorn

    app = create_app()
    uvicorn.run(app, host="0.0.0.0", port=8000)


if __name__ == "__main__":
    main()
