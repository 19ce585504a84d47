"""Constants shared by kernels (kept import-cycle-free)."""

# Accepted URI schemes (IsUriAllowed, Backend/Crawler.cs:3113-3118;
# ValidateNewUri, Crawler.cs:3311-3327).
SCHEMES = frozenset({"http", "https", "ftp"})
