"""Redirect body synthesis (http_crawler/crawler.go:91-109).

For 301/302/303/307 the reference fabricates an HTML body that meta-refreshes
to the Location header, so the redirect target is (1) mirrored as a working
static page and (2) re-extracted as a link.  The byte-exact template matters:
mirror goldens digest it and link extraction must find the <a href>.
"""

from __future__ import annotations

REDIRECT_STATUS_CODES = (301, 302, 303, 307)  # crawler.go:21


def synthesize_redirect_body(location: str) -> str:
    """Byte-parity with the Go raw-string template (crawler.go:99-108);
    the literal leading tabs come from the Go source indentation."""
    return (
        "<!DOCTYPE html>\n"
        '\t\t<html lang="en">\n'
        "\t\t<head>\n"
        f'\t\t<meta http-equiv="refresh" content="1; url={location}">\n'
        "\t\t<title>Redirecting</title>\n"
        "\t\t</head>\n"
        "\t\t<body>\n"
        f'\t\t<p>Redirecting you to <a href="{location}">{location}</a>.</p>\n'
        "\t\t</body>\n"
        "\t\t</html>"
    )


def is_redirect(status_code: int) -> bool:
    return status_code in REDIRECT_STATUS_CODES
