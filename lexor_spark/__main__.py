"""Single-document CLI — UX parity with the reference's ``lexor`` command
(`/root/reference/bin/lexor`, `lexor/command/to.py`):

    python -m lexor_spark FILE.html to text|markdown|html
    cat page.html | python -m lexor_spark - to markdown

Runs the serial kernel (the same code the Spark job executes per Arrow
batch); ``text`` is the main-content extraction path, ``markdown`` the
conversion path, ``html`` the parse→serialize normal form."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lexor_spark")
    ap.add_argument("source", help="input file, or - for stdin")
    ap.add_argument("verb", choices=["to"], help="conversion verb")
    ap.add_argument("target", choices=["text", "markdown", "html"],
                    help="output style")
    ap.add_argument("--log", action="store_true",
                    help="print parse diagnostics to stderr")
    args = ap.parse_args(argv)

    if args.source == "-":
        data = sys.stdin.buffer.read()
    else:
        with open(args.source, "rb") as fh:
            data = fh.read()
    text = data.decode("utf-8", errors="replace")

    from lexor_spark.kernel.htmlparser import parse_html

    doc, log = parse_html(text, args.source)
    if args.log:
        for e in log:
            print(f"{args.source}:{e.line}:{e.col}: {e.code} {list(e.arg)}",
                  file=sys.stderr)

    if args.target == "text":
        from lexor_spark.kernel.pipeline import extract_document
        res = extract_document(data, args.source)
        sys.stdout.write(res.text + "\n")
        return 0 if res.ok else 1
    if args.target == "markdown":
        from lexor_spark.kernel.mdwriter import write_markdown
        sys.stdout.write(write_markdown(doc) + "\n")
        return 0
    from lexor_spark.kernel.htmlwriter import write_html
    sys.stdout.write(write_html(doc) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
