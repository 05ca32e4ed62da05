from .crawl import CrawlConfig, CrawlEngine  # noqa: F401
