"""Extract the publication date from a single HTML file (mirrors the
reference's examples/from-file.go)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_htmldate_ray import Options, from_html

raw = open("/root/reference/test-files/mock/blog.python.org.html", "rb").read()
result = from_html(raw, Options(use_original_date=True))
print("Date      :", result.format())
print("Source    :", result.src_string)
