"""Fatal-error taxonomy (IsFatalError, Backend/Crawler.cs:2121-2164).

An error is FATAL (never retried) when retrying is unlikely to help:

- HTTP protocol errors with these status codes (Crawler.cs:2137-2145):
  300 Ambiguous, 301 Moved, 302 Redirect, 303 RedirectMethod,
  307 TemporaryRedirect (raw redirect responses the auto-follower
  surfaced as protocol errors), 401 Unauthorized, 402 PaymentRequired,
  404 NotFound, 406 NotAcceptable, 407 ProxyAuthenticationRequired,
  410 Gone.
- FTP protocol errors (Crawler.cs:2148-2156): 332 NeedLoginAccount,
  530 NotLoggedIn, 532 AccountNeeded, 534 ServerWantsSecureSession.
- MessageLengthLimitExceeded (Crawler.cs:2158-2161) — modeled upstream by
  the max_file_size truncation, not a status code.

Everything else — IOExceptions (connection died: html NULL in the pages
model), timeouts, 5xx server errors — is RETRYABLE (Crawler.cs:2126,2163).
"""

from __future__ import annotations

FATAL_HTTP = frozenset({300, 301, 302, 303, 307, 401, 402, 404, 406, 407, 410})
FATAL_FTP = frozenset({332, 530, 532, 534})
FATAL_CODES = FATAL_HTTP | FATAL_FTP


def is_fatal_status(code: int) -> bool:
    """True when the HTTP/FTP status code is in the reference's fatal table."""
    return code in FATAL_CODES
