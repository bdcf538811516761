"""`python -m geodiffuser_tpu.ui` — launch the UI.

Prefers the gradio app (ui/app.py) when gradio is installed; otherwise
serves the dependency-free web UI (ui/serve.py) with the same surface.
Pass --native to skip gradio even when present.
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    native = "--native" in argv
    if native:
        argv.remove("--native")
    if not native:
        try:
            import gradio  # noqa: F401

            from geodiffuser_tpu.ui.app import build_app

            build_app().queue().launch()
            return
        except ImportError:
            pass
    from geodiffuser_tpu.ui.serve import main as serve_main

    serve_main(argv)


if __name__ == "__main__":
    main()
