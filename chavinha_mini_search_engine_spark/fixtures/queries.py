"""The reference query set (FIXTURES.md §2).

Union of the 10 local perf queries (/root/reference/test_performance.py:
41-52), the 20 cloud queries (/root/reference/test_cloud_api.py:17-38) and
the conftest edge cases (/root/reference/tests/conftest.py:123-141).
"""

PERF_QUERIES = [
    "angular framework",
    "python async programming",
    "javascript promises",
    "docker container",
    "kubernetes deployment",
    "react hooks",
    "vue composition api",
    "typescript generics",
    "golang channels",
    "rust ownership",
]

CLOUD_QUERIES = [
    "react useState hook tutorial",
    "nodejs express middleware",
    "python flask routing",
    "java spring boot configuration",
    "postgresql query optimization",
    "mongodb aggregation pipeline",
    "redis cache implementation",
    "graphql schema design",
    "webpack module bundling",
    "nginx reverse proxy setup",
    "terraform infrastructure code",
    "ansible playbook examples",
    "git rebase workflow",
    "docker multi-stage builds",
    "kubernetes service mesh",
    "elasticsearch text search",
    "apache kafka streaming",
    "jenkins pipeline syntax",
    "prometheus metrics collection",
    "grafana dashboard creation",
]

EDGE_QUERIES = [
    "",
    "a",
    "SELECT * FROM users WHERE id=1; DROP TABLE users;--",
    "\U0001f40d python unicode",
    "x" * 1000,
]

ALL_QUERIES = PERF_QUERIES + CLOUD_QUERIES + EDGE_QUERIES
