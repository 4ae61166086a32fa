"""``python -m ontonotes_5_parsing_ray`` entry point."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
