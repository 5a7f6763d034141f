"""Human-facing read/control surfaces over a crawl store."""
