"""Extract date + time + timezone (mirrors examples/extract-time.go)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_htmldate_ray import Options, from_html

html = """<html><head>
<meta property="article:published_time" content="2021-07-13T19:25:31+00:00"/>
</head><body/></html>"""

result = from_html(html, Options(extract_time=True, use_original_date=True))
print("Date        :", result.format())
print("Has time    :", result.has_time)
print("Time        :", result.date_time.strftime("%H:%M:%S"))
print("Has timezone:", result.has_timezone)
