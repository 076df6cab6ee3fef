"""Interactive SQL shell (the reference ships a line client,
`/root/reference` cli tooling; same UX here over either transport):

    python -m nowdb_spark --base /tmp/warehouse            # embedded
    python -m nowdb_spark --connect host:55505             # server
    python -m nowdb_spark --base D -e "use db; select ..." # scripted

Statements end with ';'. Embedded mode spins up a local SparkSession;
connect mode speaks the newline-JSON session protocol via client.py.
"""

from __future__ import annotations

import argparse
import sys


def _print_result(r) -> None:
    kind = getattr(r, "kind", None)
    if callable(kind):          # engine results: method; client: property
        kind = None

    # cursor/row results iterate rows; everything else prints status
    try:
        cols = r.columns() if callable(getattr(r, "columns", None)) \
            else getattr(r, "columns", None)
    except Exception:  # noqa: BLE001
        cols = None
    if hasattr(r, "__iter__") and (kind in ("cursor", "row")
                                   or type(r).__name__ in
                                   ("CursorResult", "RowResult")):
        if cols:
            print("\t".join(str(c) for c in cols))
        n = 0
        for row in r:
            vals = row.row() if hasattr(row, "row") else row
            print("\t".join("NULL" if v is None else str(v)
                            for v in vals))
            n += 1
        print(f"-- {n} row(s)")
        return
    if not r.ok():
        print(f"ERROR [{r.code()}]: {r.details()}", file=sys.stderr)
        return
    aff = getattr(r, "affected", None)
    if aff is not None and not callable(aff):
        errs = getattr(r, "errors", 0)
        errs = errs if not callable(errs) else errs()
        print(f"OK, {aff} affected, {errs} errors")
    elif callable(aff):
        print(f"OK, {aff()} affected, {r.errors()} errors")
    else:
        print("OK")


def _statements(text: str):
    """Split on ';' respecting single-quoted strings."""
    buf, in_str = [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            stmt = "".join(buf).strip()
            if stmt:
                yield stmt
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        yield tail


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nowdb_spark")
    ap.add_argument("--base", help="warehouse dir (embedded engine)")
    ap.add_argument("--connect", help="host:port of a running server")
    ap.add_argument("--user", default=None)
    ap.add_argument("--password", default=None)
    ap.add_argument("-e", "--execute", default=None,
                    help="';'-separated statements; exit after running")
    args = ap.parse_args(argv)

    if bool(args.base) == bool(args.connect):
        ap.error("exactly one of --base / --connect is required")

    if args.connect:
        from nowdb_spark.client import connect
        host, _, port = args.connect.partition(":")
        session = connect(host, int(port or 55505), args.user,
                          args.password)
        run = session.execute
    else:
        from nowdb_spark.engine import Engine
        from nowdb_spark.session import get_spark
        session = Engine(get_spark("nowdb_spark_shell"), args.base)
        run = session.execute

    def run_all(text: str) -> int:
        rc = 0
        for stmt in _statements(text):
            r = run(stmt)
            _print_result(r)
            if not r.ok():
                rc = 1
        return rc

    if args.execute is not None:
        return run_all(args.execute)

    print("nowdb_spark shell — end statements with ';', "
          "\\q to quit", file=sys.stderr)
    buf: list[str] = []
    while True:
        try:
            prompt = "now> " if not buf else "...> "
            line = input(prompt)
        except EOFError:
            break
        if line.strip() in ("\\q", "quit", "exit") and not buf:
            break
        buf.append(line)
        if line.rstrip().endswith(";"):
            run_all("\n".join(buf))
            buf = []
    return 0


if __name__ == "__main__":
    sys.exit(main())
