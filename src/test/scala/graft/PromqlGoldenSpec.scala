package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.promql.{Compiler, Parser}

/** Mini promqltest runner (the reference's primary correctness authority is
  * Prometheus' upstream `.test` corpus, ref db/db_test.go:53-116; this is the
  * same `load`/`eval instant` format, scoped to the features we implement).
  *
  * Series notation: `metric{l="v", …} 1+2x40` (start+step×count) or literal
  * point lists incl. NaN. Labels are dynamic per series — the runner builds a
  * wide nullable DataFrame like the reference's per-shard schemas.
  */
class PromqlGoldenSpec extends PromqlTestRunner {

  private val corpus =
    """
      |load 10s
      |  metric{pod="nginx-1", a="foo"} 1+2x40
      |  metric{pod="nginx-2", b="bar"} 10+10x40
      |  http{job="api", code="404"} 0+3x40
      |  http{job="api", code="200"} 0+5x40
      |  data{test="nan"} NaN 1 NaN
      |  adv{n_samples="x", k="y", resets="z"} 0+10x40
      |  flat{c="1"} 5 5 5
      |  st{s="1"} 1 2 stale 4
      |  zz{z="1"} 0 -0.0 3
      |  ctr{r="1"} 0 5 NaN 10
      |  im{s="p"} Infinity Infinity Infinity
      |  im{s="n"} -Infinity -Infinity -Infinity
      |  imix{s="m"} Infinity -Infinity 1
      |  hq{h="a", le="0.5"} 0 1 2
      |  hq{h="a", le="1"} 0 2 4
      |  hq{h="a", le="+Inf"} 0 2 4
      |  hqm{h="m", le="0.5"} 1 1 1
      |  hqm{h="m", le="1"} 2 2 2
      |  hqn{h="n", le="0.5"} 5 5 5
      |  hqn{h="n", le="1"} 3 3 3
      |  hqn{h="n", le="+Inf"} 5 5 5
      |  hq0{h="z", le="0.5"} 0 0 0
      |  hq0{h="z", le="+Inf"} 0 0 0
      |
      |eval instant at 100s metric
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s metric{foo=""}
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s metric{pod=~"nginx-.*", a!="foo"}
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s sum(metric)
      |  {} 131
      |
      |eval instant at 100s sum by (pod) (metric)
      |  {pod="nginx-1"} 21
      |  {pod="nginx-2"} 110
      |
      |eval instant at 100s avg without (code) (http)
      |  {job="api"} 40
      |
      |eval instant at 100s count(metric)
      |  {} 2
      |
      |eval instant at 100s topk(1, metric)
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s http{code="404"} / on(job) http{code="200"}
      |  {job="api"} 0.6
      |
      |eval instant at 100s rate(http{code="404"}[50s])
      |  {job="api", code="404"} 0.3
      |
      |eval instant at 100s sum_over_time(sum(http)[30s:10s])
      |  {} 216
      |
      |eval instant at 20s data
      |  {test="nan", __name__="data"} NaN
      |
      |eval instant at 100s metric{pod="nginx-1"} + metric{pod="nginx-1"}
      |  {pod="nginx-1", a="foo"} 42
      |
      |eval instant at 100s metric @ 50
      |  {a="foo", pod="nginx-1", __name__="metric"} 11
      |  {b="bar", pod="nginx-2", __name__="metric"} 60
      |
      |eval instant at 100s sum(metric @ start())
      |  {} 131
      |
      |eval instant at 100s irate(http{code="404"}[30s])
      |  {job="api", code="404"} 0.3
      |
      |eval instant at 100s limitk(2, metric)
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s http{code="404"} * on(job) group_left(code) http{code="200"}
      |  {job="api", code="200"} 1500
      |
      |eval instant at 100s mad_over_time(http{code="404"}[30s])
      |  {job="api", code="404"} 3
      |
      |eval instant at 100s ts_of_max_over_time(metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} 100
      |
      |eval instant at 100s ts_of_min_over_time(metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} 80
      |
      |eval instant at 100s ts_of_last_over_time(metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} 100
      |
      |eval instant at 20s ts_of_max_over_time(flat[30s])
      |  {c="1"} 20
      |
      |eval instant at 20s ts_of_min_over_time(flat[30s])
      |  {c="1"} 20
      |
      |eval instant at 20s ts_of_max_over_time(data[30s])
      |  {test="nan"} 10
      |
      |eval instant at 20s ts_of_min_over_time(data[30s])
      |  {test="nan"} 10
      |
      |eval instant at 100s vector(2 ^ 3 ^ 2)
      |  {} 512
      |
      |eval instant at 100s -metric{pod="nginx-1"}
      |  {a="foo", pod="nginx-1"} -21
      |
      |eval instant at 100s quantile(1.5, metric)
      |  {} Infinity
      |
      |eval instant at 100s quantile(-0.5, metric)
      |  {} -Infinity
      |
      |eval instant at 100s quantile_over_time(1.5, metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} Infinity
      |
      |eval instant at 100s stddev(metric)
      |  {} 44.5
      |
      |eval instant at 100s metric > bool 50
      |  {a="foo", pod="nginx-1"} 0
      |  {b="bar", pod="nginx-2"} 1
      |
      |eval instant at 100s clamp(metric, 30, 100)
      |  {a="foo", pod="nginx-1"} 30
      |  {b="bar", pod="nginx-2"} 100
      |
      |eval instant at 100s sum by (pod) (metric offset 30s)
      |  {pod="nginx-1"} 15
      |  {pod="nginx-2"} 80
      |
      |eval instant at 20s sum(data)
      |  {} NaN
      |
      |eval instant at 20s count_values("v", flat)
      |  {v="5"} 1
      |
      |eval instant at 100s group(metric)
      |  {} 1
      |
      |eval instant at 100s vector(scalar(metric{pod="nginx-1"}))
      |  {} 21
      |
      |eval instant at 20s max(data or flat)
      |  {} 5
      |
      |eval instant at 20s min(data or flat)
      |  {} 5
      |
      |eval instant at 20s topk(1, data or flat)
      |  {c="1", __name__="flat"} 5
      |
      |eval instant at 20s bottomk(1, data or flat)
      |  {c="1", __name__="flat"} 5
      |
      |eval instant at 100s metric > 50
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s metric * 2
      |  {a="foo", pod="nginx-1"} 42
      |  {b="bar", pod="nginx-2"} 220
      |
      |eval instant at 90s metric offset -10s
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s absent_over_time(nosuch[50s])
      |  {} 1
      |
      |eval instant at 100s present_over_time(metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} 1
      |
      |eval instant at 100s day_of_week(vector(time()))
      |  {} 4
      |
      |eval instant at 20s sum_over_time(data[30s])
      |  {test="nan"} NaN
      |
      |eval instant at 20s avg_over_time(data[30s])
      |  {test="nan"} NaN
      |
      |eval instant at 20s max_over_time(data[30s])
      |  {test="nan"} 1
      |
      |eval instant at 20s min_over_time(data[30s])
      |  {test="nan"} 1
      |
      |eval instant at 100s count_values("v", http) by (job)
      |  {job="api", v="30"} 1
      |  {job="api", v="50"} 1
      |
      |eval instant at 100s label_join(metric{pod="nginx-1"}, "all", "-", "pod", "a")
      |  {a="foo", pod="nginx-1", all="nginx-1-foo", __name__="metric"} 21
      |
      |eval instant at 100s round(metric, 5)
      |  {a="foo", pod="nginx-1"} 20
      |  {b="bar", pod="nginx-2"} 110
      |
      |eval instant at 100s metric atan2 metric
      |  {a="foo", pod="nginx-1"} 0.7853981633974483
      |  {b="bar", pod="nginx-2"} 0.7853981633974483
      |
      |eval instant at 100s rate(adv[50s])
      |  {n_samples="x", k="y", resets="z"} 1
      |
      |eval instant at 100s changes(adv[50s])
      |  {n_samples="x", k="y", resets="z"} 4
      |
      |eval instant at 100s quantile_over_time(0.5, adv[50s])
      |  {n_samples="x", k="y", resets="z"} 80
      |
      |eval instant at 100s sum by (n_samples) (adv)
      |  {n_samples="x"} 100
      |
      |eval instant at 105s timestamp(metric)
      |  {a="foo", pod="nginx-1"} 100
      |  {b="bar", pod="nginx-2"} 100
      |
      |eval instant at 100s scalar(metric{pod="nginx-1"})
      |  {} 21
      |
      |eval instant at 100s scalar(metric)
      |  {} NaN
      |
      |eval instant at 100s absent(metric{a="nope", c="x"})
      |  {a="nope", c="x"} 1
      |
      |eval instant at 100s predict_linear(http{code="404"}[50s], 10)
      |  {job="api", code="404"} 33
      |
      |eval instant at 100s clamp(metric, 30, 60)
      |  {a="foo", pod="nginx-1"} 30
      |  {b="bar", pod="nginx-2"} 60
      |
      |eval instant at 100s label_replace(metric{pod="nginx-1"}, "env", "$1", "pod", "nginx-(.*)")
      |  {a="foo", pod="nginx-1", env="1", __name__="metric"} 21
      |
      |eval instant at 100s vector(time())
      |  {} 100
      |
      |eval instant at 110s timestamp(metric offset 10s)
      |  {a="foo", pod="nginx-1"} 100
      |  {b="bar", pod="nginx-2"} 100
      |
      |eval instant at 100s count_values("v", http)
      |  {v="30"} 1
      |  {v="50"} 1
      |
      |eval instant at 20s st
      |
      |eval instant at 25s st
      |
      |eval instant at 30s st
      |  {s="1", __name__="st"} 4
      |
      |eval instant at 30s count_over_time(st[40s])
      |  {s="1"} 3
      |
      |eval instant at 30s sum_over_time(st[10s])
      |  {s="1"} 4
      |
      |eval instant at 30s last_over_time(st[20s])
      |  {s="1", __name__="st"} 4
      |
      |eval instant at 100s metric @ 50 offset 10s
      |  {a="foo", pod="nginx-1", __name__="metric"} 9
      |  {b="bar", pod="nginx-2", __name__="metric"} 50
      |
      |eval instant at 100s sum(metric offset 10s @ end())
      |  {} 119
      |
      |eval instant at 100s rate(http{code="404"}[50s] @ 50)
      |  {job="api", code="404"} 0.3
      |
      |eval instant at 100s sum(metric) > bool 100
      |  {} 1
      |
      |eval instant at 100s sum by (pod) (metric) == bool 21
      |  {pod="nginx-1"} 1
      |  {pod="nginx-2"} 0
      |
      |eval instant at 100s avg(metric) <= bool 50
      |  {} 0
      |
      |eval instant at 100s quantile(0.5, metric)
      |  {} 65.5
      |
      |eval instant at 100s quantile(1.5, metric)
      |  {} Inf
      |
      |eval instant at 100s quantile(-0.5, metric)
      |  {} -Inf
      |
      |eval instant at 100s quantile_over_time(1.5, http{code="404"}[30s])
      |  {job="api", code="404"} Inf
      |
      |eval instant at 20s count_values("v", data)
      |  {v="NaN"} 1
      |
      |eval instant at 20s data == data
      |
      |eval instant at 20s data != 0
      |  {test="nan", __name__="data"} NaN
      |
      |eval instant at 20s sum(im)
      |  {} NaN
      |
      |eval instant at 20s avg(im)
      |  {} NaN
      |
      |eval instant at 20s max(im)
      |  {} Inf
      |
      |eval instant at 20s min(im)
      |  {} -Inf
      |
      |eval instant at 20s stddev(im)
      |  {} NaN
      |
      |eval instant at 20s quantile(0.5, im)
      |  {} NaN
      |
      |eval instant at 20s sum_over_time(imix[30s])
      |  {s="m"} NaN
      |
      |eval instant at 20s avg_over_time(imix[30s])
      |  {s="m"} NaN
      |
      |eval instant at 20s max_over_time(imix[30s])
      |  {s="m"} Inf
      |
      |eval instant at 20s min_over_time(imix[30s])
      |  {s="m"} -Inf
      |
      |eval instant at 20s clamp(im, 0, 10)
      |  {s="n"} 0
      |  {s="p"} 10
      |
      |eval instant at 20s sgn(im)
      |  {s="n"} -1
      |  {s="p"} 1
      |
      |eval instant at 20s im > 0
      |  {s="p", __name__="im"} Inf
      |
      |eval instant at 20s data > bool 0
      |  {test="nan"} 0
      |
      |eval instant at 20s ts_of_min_over_time(zz[30s])
      |  {z="1"} 10
      |
      |eval instant at 20s ts_of_max_over_time(zz[30s])
      |  {z="1"} 20
      |
      |eval instant at 100s sum_over_time(sum(http)[30s:10s] offset 10s)
      |  {} 192
      |
      |eval instant at 100s max_over_time((metric{pod="nginx-1"} @ 50)[30s:10s])
      |  {a="foo", pod="nginx-1"} 11
      |
      |eval instant at 100s absent_over_time(nosuch[10s])
      |  {} 1
      |
      |eval instant at 100s deriv(http{code="404"}[50s])
      |  {job="api", code="404"} 0.3
      |
      |eval instant at 100s increase(http{code="404"}[50s])
      |  {job="api", code="404"} 15
      |
      |eval instant at 100s resets(adv[50s])
      |  {n_samples="x", k="y", resets="z"} 0
      |
      |eval instant at 100s stddev(metric)
      |  {} 44.5
      |
      |eval instant at 100s stdvar(metric)
      |  {} 1980.25
      |
      |eval instant at 100s bottomk(1, metric)
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |
      |eval instant at 100s metric{pod="nginx-1"} + on() group_left(b) metric{pod="nginx-2"}
      |  {a="foo", pod="nginx-1", b="bar"} 131
      |
      |# upstream funcClamp: max < min returns the EMPTY vector
      |eval instant at 100s clamp(metric, 60, 30)
      |
      |eval instant at 100s clamp_min(metric, 50)
      |  {a="foo", pod="nginx-1"} 50
      |  {b="bar", pod="nginx-2"} 110
      |
      |eval instant at 100s clamp_max(metric, 50)
      |  {a="foo", pod="nginx-1"} 21
      |  {b="bar", pod="nginx-2"} 50
      |
      |eval instant at 100s clamp_max(data, 50)
      |  {test="nan"} NaN
      |
      |eval instant at 100s ln(0 - metric{pod="nginx-1"})
      |  {a="foo", pod="nginx-1"} NaN
      |
      |eval instant at 100s vector(0 ^ 0)
      |  {} 1
      |
      |eval instant at 100s vector((0/0) ^ 0)
      |  {} 1
      |
      |eval instant at 100s vector(2 + 3 * 4 ^ 2)
      |  {} 50
      |
      |eval instant at 100s ln(vector(0))
      |  {} -Inf
      |
      |eval instant at 100s sqrt(0 - metric{pod="nginx-1"})
      |  {a="foo", pod="nginx-1"} NaN
      |
      |eval instant at 100s log2(vector(8))
      |  {} 3
      |
      |eval instant at 100s floor(vector(0 - 1.5))
      |  {} -2
      |
      |eval instant at 100s ceil(vector(0 - 1.5))
      |  {} -1
      |
      |eval instant at 100s delta(metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} 6
      |
      |eval instant at 100s idelta(metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} 2
      |
      |eval instant at 100s double_exponential_smoothing(http{code="404"}[50s], 0.5, 0.5)
      |  {job="api", code="404"} 30
      |
      |eval instant at 100s month(vector(0))
      |  {} 1
      |
      |eval instant at 100s year(vector(0))
      |  {} 1970
      |
      |eval instant at 100s days_in_month(vector(0))
      |  {} 31
      |
      |eval instant at 100s hour(vector(3600))
      |  {} 1
      |
      |eval instant at 100s label_replace(metric{pod="nginx-1"}, "env", "$1", "pod", "apache-(.*)")
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |
      |eval instant at 100s vector(1) and vector(2)
      |  {} 1
      |
      |eval instant at 100s vector(1) unless vector(2)
      |
      |eval instant at 100s abs(0 - metric{pod="nginx-1"})
      |  {a="foo", pod="nginx-1"} 21
      |
      |eval instant at 100s sgn(0 - metric{pod="nginx-1"})
      |  {a="foo", pod="nginx-1"} -1
      |
      |eval instant at 100s http{code="404"} >= bool on(job) http{code="200"}
      |  {job="api"} 0
      |
      |eval instant at 30s changes(ctr[30s])
      |  {r="1"} 2
      |
      |eval instant at 30s resets(ctr[30s])
      |  {r="1"} 0
      |
      |eval instant at 30s increase(ctr[30s])
      |  {r="1"} 7.5
      |
      |eval instant at 30s rate(ctr[30s])
      |  {r="1"} 0.25
      |
      |eval instant at 20s histogram_quantile(0.5, hq)
      |  {h="a"} 0.5
      |
      |eval instant at 20s histogram_quantile(0.75, hq)
      |  {h="a"} 0.75
      |
      |eval instant at 20s histogram_quantile(1, hq)
      |  {h="a"} 1
      |
      |eval instant at 20s histogram_quantile(0, hq)
      |  {h="a"} 0
      |
      |eval instant at 20s histogram_quantile(0.5, hqm)
      |  {h="m"} NaN
      |
      |eval instant at 20s histogram_quantile(0.5, hqn)
      |  {h="n"} 0.25
      |
      |eval instant at 20s histogram_quantile(0.5, hq0)
      |  {h="z"} NaN
      |
      |eval instant at 20s histogram_quantile(-1, hq)
      |  {h="a"} -Inf
      |
      |eval instant at 20s histogram_quantile(2, hq)
      |  {h="a"} Inf
      |
      |eval instant at 100s metric / 0
      |  {a="foo", pod="nginx-1"} Inf
      |  {b="bar", pod="nginx-2"} Inf
      |
      |eval instant at 100s (metric - metric) / 0
      |  {a="foo", pod="nginx-1"} NaN
      |  {b="bar", pod="nginx-2"} NaN
      |
      |eval instant at 100s (0 - metric) / 0
      |  {a="foo", pod="nginx-1"} -Inf
      |  {b="bar", pod="nginx-2"} -Inf
      |
      |eval instant at 100s metric % 0
      |  {a="foo", pod="nginx-1"} NaN
      |  {b="bar", pod="nginx-2"} NaN
      |
      |eval instant at 100s metric{pod="nginx-1"} / on() (zz @ 10)
      |  {} -Inf
      |
      |eval range from 0s to 50s step 10s sum(http)
      |  {} 0 8 16 24 32 40
      |
      |eval range from 0s to 30s step 10s metric{pod="nginx-2"}
      |  {b="bar", pod="nginx-2", __name__="metric"} 10 20 30 40
      |
      |eval range from 0s to 40s step 20s sum_over_time(metric{pod="nginx-1"}[20s])
      |  {a="foo", pod="nginx-1"} 1 8 16
      |
      |eval range from 0s to 20s step 10s data
      |  {test="nan", __name__="data"} NaN 1 NaN
      |
      |eval range from 0s to 20s step 10s irate(metric{pod="nginx-1"}[20s])
      |  {a="foo", pod="nginx-1"} _ 0.2 0.2
      |
      |eval range from 0s to 30s step 10s sum by (pod) (metric)
      |  {pod="nginx-1"} 1 3 5 7
      |  {pod="nginx-2"} 10 20 30 40
      |
      |eval range from 0s to 20s step 10s histogram_quantile(0.5, hq)
      |  {h="a"} NaN 0.5 0.5
      |
      |eval range from 10s to 30s step 10s changes(ctr[20s])
      |  {r="1"} 1 1 1
      |
      |eval range from 10s to 30s step 10s sum(http offset 10s)
      |  {} 0 8 16
      |
      |eval range from 0s to 20s step 10s clamp_max(metric{pod="nginx-2"}, 25)
      |  {b="bar", pod="nginx-2"} 10 20 25
      |
      |eval range from 0s to 20s step 10s metric{pod="nginx-1"} + metric{pod="nginx-2"}
      |
      |eval instant at 100s round(metric, 0)
      |  {a="foo", pod="nginx-1"} NaN
      |  {b="bar", pod="nginx-2"} NaN
      |
      |eval instant at 100s http{code="200"} * on(job) group_right(code) http{code="404"}
      |  {code="200", job="api"} 1500
      |
      |eval instant at 100s http{code="200"} / on(job) group_right() http
      |  {code="404", job="api"} 1.6666666666666667
      |  {code="200", job="api"} 1
      |
      |eval instant at 100s topk(1, {__name__=~"metric|http"})
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s count({__name__=~"metric|http"})
      |  {} 4
      |
      |eval instant at 20s st
      |
      |eval instant at 20s count_over_time(st[20s])
      |  {s="1"} 1
      |
      |eval instant at 30s count_over_time(st[30s])
      |  {s="1"} 2
      |
      |eval instant at 30s last_over_time(st[10s])
      |  {s="1", __name__="st"} 4
      |
      |eval instant at 20s last_over_time(st[10s])
      |
      |eval instant at 100s metric @ 50 offset 10s
      |  {a="foo", pod="nginx-1", __name__="metric"} 9
      |  {b="bar", pod="nginx-2", __name__="metric"} 50
      |
      |eval instant at 100s sum(metric @ end() offset 20s)
      |  {} 107
      |
      |eval instant at 100s rate(http{code="404"}[50s] offset 10s)
      |  {job="api", code="404"} 0.3
      |
      |eval instant at 100s (metric @ 50) + (metric @ 100)
      |  {a="foo", pod="nginx-1"} 32
      |  {b="bar", pod="nginx-2"} 170
      |
      |eval instant at 100s sum(metric) > bool 100
      |  {} 1
      |
      |eval instant at 100s sum by (pod) (metric) == bool 110
      |  {pod="nginx-1"} 0
      |  {pod="nginx-2"} 1
      |
      |eval instant at 100s avg without (code) (http) >= bool 40
      |  {job="api"} 1
      |
      |eval instant at 100s count(metric) < bool 2
      |  {} 0
      |
      |eval instant at 100s quantile(1.5, metric)
      |  {} Inf
      |
      |eval instant at 100s quantile(-0.5, metric)
      |  {} -Inf
      |
      |eval instant at 100s quantile(NaN, metric)
      |  {} NaN
      |
      |eval instant at 20s count_values("v", data)
      |  {v="NaN"} 1
      |
      |eval instant at 10s count_values("v", data)
      |  {v="1"} 1
      |
      |eval instant at 100s limit_ratio(1.0, metric)
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s limit_ratio(-1.0, metric)
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s limit_ratio(0.5, metric) or limit_ratio(-0.5, metric)
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |  {b="bar", pod="nginx-2", __name__="metric"} 110
      |
      |eval instant at 100s limit_ratio(0.3, http) or limit_ratio(-0.3, http)
      |  {job="api", code="404", __name__="http"} 30
      |  {job="api", code="200", __name__="http"} 50
      |
      |eval instant at 100s count(limit_ratio(0.7, metric) or limit_ratio(-0.7, metric))
      |  {} 2
      |
      |eval instant at 100s round(metric / 40)
      |  {a="foo", pod="nginx-1"} 1
      |  {b="bar", pod="nginx-2"} 3
      |
      |eval instant at 100s round(metric, 10)
      |  {a="foo", pod="nginx-1"} 20
      |  {b="bar", pod="nginx-2"} 110
      |
      |eval instant at 100s scalar(metric{pod="nginx-1"})
      |  {} 21
      |
      |eval instant at 100s scalar(metric)
      |  {} NaN
      |
      |eval instant at 100s timestamp(metric{pod="nginx-1"})
      |  {a="foo", pod="nginx-1"} 100
      |
      |eval instant at 100s metric{pod="nginx-1"} and metric
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |
      |eval instant at 100s metric unless metric{pod="nginx-2"}
      |  {a="foo", pod="nginx-1", __name__="metric"} 21
      |
      |eval instant at 100s quantile_over_time(1.5, metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} Infinity
      |
      |eval instant at 100s quantile_over_time(-0.5, metric{pod="nginx-1"}[30s])
      |  {a="foo", pod="nginx-1"} -Infinity
      |
      |eval instant at 100s sin(vector(0))
      |  {} 0
      |
      |eval instant at 100s cos(vector(0))
      |  {} 1
      |
      |eval instant at 100s deg(vector(pi()))
      |  {} 180
      |
      |eval instant at 100s rad(vector(180))
      |  {} 3.141592653589793
      |
      |eval instant at 100s exp(vector(1))
      |  {} 2.718281828459045
      |
      |eval instant at 100s sqrt(0 - metric{pod="nginx-1"})
      |  {a="foo", pod="nginx-1"} NaN
      |
      |eval instant at 100s year(vector(0))
      |  {} 1970
      |
      |eval instant at 100s minute(vector(120))
      |  {} 2
      |
      |eval instant at 100s day_of_year(vector(0))
      |  {} 1
      |
      |eval instant at 100s label_replace(metric{pod="nginx-1"}, "pod", "x$1", "pod", "nginx-(.*)")
      |  {a="foo", pod="x1", __name__="metric"} 21
      |
      |eval instant at 100s 2 ^ metric{pod="nginx-1"} % 10
      |  {a="foo", pod="nginx-1"} 2
      |
      |eval instant at 20s avg(im)
      |  {} NaN
      |
      |eval_fail instant at 100s topk("x", metric)
      |  expected_fail_message expected type scalar in aggregation parameter, got string
      |
      |eval_fail instant at 100s info(metric)
      |  expected_fail_message experimental
      |
      |eval_fail instant at 100s label_replace(metric, "~invalid", "", "", "")
      |  expected_fail_message invalid destination label name in label_replace
      |
      |eval_fail instant at 100s label_replace(metric, "y", "$1", "pod", "(")
      |  expected_fail_message invalid regular expression in label_replace
      |
      |eval_fail instant at 100s label_join(metric, "~bad", "-", "pod")
      |  expected_fail_message invalid destination label name in label_join
      |
      |eval_fail instant at 100s metric[5m]
      |  expected_fail_message range vector must be an argument of a range function
      |
      |eval_fail instant at 100s scalar("abc")
      |""".stripMargin

  /** Native-histogram corpus in upstream promqltest's `{{…}}` sample-literal
    * notation (prometheus promql/promqltest/testdata/native_histograms.test
    * format; expectations hand-derived from Prometheus v3 semantics —
    * exponential interpolation in exponential buckets, linear in the
    * sign-clamped zero bucket, float-style extrapolation without the
    * zero-crossing clamp for histogram rate). */
  private val nhCorpus =
    """
      |load 5m
      |  eh{t="e"} {{}}
      |  s1{t="a"} {{schema:0 sum:5 count:4 buckets:[1 2 1]}}
      |  s2{t="b"} {{schema:1 sum:10 count:6 buckets:[1 2 1 2] offset:2}}
      |  sneg{t="n"} {{schema:0 sum:-5 count:4 n_buckets:[1 2 1]}}
      |  szb{t="z"} {{schema:0 sum:4 count:6 z_bucket:2 z_bucket_w:0.5 buckets:[2 2]}}
      |  ctr{t="c"} {{schema:0 sum:4 count:4 buckets:[1 1 1 1]}} {{schema:0 sum:8 count:8 buckets:[2 2 2 2]}} {{schema:0 sum:12 count:12 buckets:[3 3 3 3]}}
      |  pair{p="1"} {{schema:0 count:4 sum:5 buckets:[1 2 1]}}
      |  pair{p="2"} {{schema:1 count:6 sum:10 buckets:[1 2 1 2] offset:2}}
      |  gaps{t="g"} {{schema:0 count:2 sum:2 buckets:[2]}}x1 _ {{schema:0 count:6 sum:6 buckets:[6]}}
      |  trio{p="1"} {{schema:0 count:4 sum:5 buckets:[1 2 1]}}
      |  trio{p="2"} {{schema:1 count:6 sum:10 buckets:[1 2 1 2] offset:2}}
      |  trio{p="3"} {{schema:2 count:4 sum:8 buckets:[1 1 1 1] offset:4}}
      |  zmix{q="1"} {{schema:0 count:3 sum:3 z_bucket:2 z_bucket_w:0.25 buckets:[1]}}
      |  zmix{q="2"} {{schema:0 count:4 sum:4 z_bucket:3 z_bucket_w:0.5 buckets:[1]}}
      |  npmix{q="1"} {{schema:0 count:4 sum:2 buckets:[2] n_buckets:[2]}}
      |  npmix{q="2"} {{schema:1 count:2 sum:1 n_buckets:[2] n_offset:2}}
      |
      |eval instant at 1m histogram_count(eh)
      |  {t="e"} 0
      |
      |eval instant at 1m histogram_sum(eh)
      |  {t="e"} 0
      |
      |eval instant at 1m histogram_avg(eh)
      |  {t="e"} NaN
      |
      |eval instant at 1m histogram_quantile(0.5, eh)
      |  {t="e"} NaN
      |
      |eval instant at 1m histogram_fraction(0, 4, eh)
      |  {t="e"} NaN
      |
      |eval instant at 1m histogram_count(s1)
      |  {t="a"} 4
      |
      |eval instant at 1m histogram_sum(s1)
      |  {t="a"} 5
      |
      |eval instant at 1m histogram_avg(s1)
      |  {t="a"} 1.25
      |
      |eval instant at 1m histogram_stdvar(s1)
      |  {t="a"} 0.7100243558256704
      |
      |eval instant at 1m histogram_stddev(s1)
      |  {t="a"} 0.842629429717281
      |
      |eval instant at 1m histogram_quantile(0.5, s1)
      |  {t="a"} 1.4142135623730951
      |
      |eval instant at 1m histogram_quantile(0.75, s1)
      |  {t="a"} 2
      |
      |eval instant at 1m histogram_quantile(0.875, s1)
      |  {t="a"} 2.8284271247461903
      |
      |eval instant at 1m histogram_quantile(1, s1)
      |  {t="a"} 4
      |
      |eval instant at 1m histogram_fraction(0, 2, s1)
      |  {t="a"} 0.75
      |
      |eval instant at 1m histogram_fraction(1, 2, s1)
      |  {t="a"} 0.5
      |
      |eval instant at 1m histogram_fraction(0, 1.4142135623730951, s1)
      |  {t="a"} 0.5
      |
      |eval instant at 1m histogram_count(s2)
      |  {t="b"} 6
      |
      |eval instant at 1m histogram_avg(s2)
      |  {t="b"} 1.6666666666666667
      |
      |eval instant at 1m histogram_quantile(0.5, s2)
      |  {t="b"} 2.8284271247461903
      |
      |eval instant at 1m histogram_quantile(0.5, sneg)
      |  {t="n"} -1.4142135623730951
      |
      |eval instant at 1m histogram_quantile(1, sneg)
      |  {t="n"} -0.5
      |
      |eval instant at 1m histogram_fraction(-2, -1, sneg)
      |  {t="n"} 0.5
      |
      |eval instant at 1m histogram_quantile(0.25, szb)
      |  {t="z"} 0.375
      |
      |eval instant at 1m histogram_quantile(0.5, szb)
      |  {t="z"} 0.7071067811865476
      |
      |eval instant at 1m histogram_fraction(0, 0.5, szb)
      |  {t="z"} 0.3333333333333333
      |
      |eval instant at 1m histogram_count(sum(pair))
      |  {} 10
      |
      |eval instant at 1m histogram_sum(sum(pair))
      |  {} 15
      |
      |eval instant at 1m histogram_avg(sum(pair))
      |  {} 1.5
      |
      |eval instant at 1m histogram_quantile(0.5, sum(pair))
      |  {} 2.378414230005442
      |
      |eval instant at 1m histogram_count(avg(pair))
      |  {} 5
      |
      |eval instant at 1m histogram_count(s1) + histogram_sum(s1)
      |  {t="a"} 9
      |
      |eval instant at 11m histogram_count(rate(ctr[10m]))
      |  {t="c"} 0.013333333333333334
      |
      |eval instant at 11m histogram_sum(rate(ctr[10m]))
      |  {t="c"} 0.013333333333333334
      |
      |eval instant at 11m histogram_count(increase(ctr[10m]))
      |  {t="c"} 8
      |
      |eval instant at 11m histogram_quantile(0.5, rate(ctr[10m]))
      |  {t="c"} 2
      |
      |eval instant at 11m histogram_count(gaps)
      |
      |eval instant at 6m histogram_count(gaps)
      |  {t="g"} 2
      |
      |eval instant at 16m histogram_count(gaps)
      |  {t="g"} 6
      |
      |eval instant at 1m s1
      |  {t="a", __name__="s1"} {{schema:0 sum:5 count:4 buckets:[1 2 1]}}
      |
      |eval instant at 1m eh
      |  {t="e", __name__="eh"} {{}}
      |
      |eval instant at 11m rate(ctr[10m])
      |  {t="c"} {{schema:0 count:0.013333333333333334 sum:0.013333333333333334 buckets:[0.0033333333333333335 0.0033333333333333335 0.0033333333333333335 0.0033333333333333335]}}
      |
      |eval instant at 1m sum(pair)
      |  {} {{schema:0 count:10 sum:15 buckets:[1 3 4 2]}}
      |
      |eval instant at 1m sum by (p) (pair)
      |  {p="1"} {{schema:0 count:4 sum:5 buckets:[1 2 1]}}
      |  {p="2"} {{schema:1 count:6 sum:10 buckets:[1 2 1 2] offset:2}}
      |
      |eval instant at 1m histogram_fraction(-Inf, Inf, s1)
      |  {t="a"} 1
      |
      |eval instant at 1m histogram_quantile(NaN, s1)
      |  {t="a"} NaN
      |
      |eval instant at 1m histogram_avg(sneg)
      |  {t="n"} -1.25
      |
      |eval instant at 1m histogram_stddev(sneg)
      |  {t="n"} 0.842629429717281
      |
      |eval instant at 1m histogram_fraction(0.5, 1, szb)
      |  {t="z"} 0.3333333333333333
      |
      |eval instant at 1m histogram_fraction(-0.1, 0.1, szb)
      |  {t="z"} 0.06666666666666667
      |
      |eval range from 0s to 10m step 5m s1
      |  {t="a", __name__="s1"} {{schema:0 sum:5 count:4 buckets:[1 2 1]}} _ _
      |
      |eval range from 0s to 10m step 5m ctr
      |  {t="c", __name__="ctr"} {{schema:0 sum:4 count:4 buckets:[1 1 1 1]}} {{schema:0 sum:8 count:8 buckets:[2 2 2 2]}} {{schema:0 sum:12 count:12 buckets:[3 3 3 3]}}
      |
      |eval range from 5m to 15m step 5m histogram_count(ctr)
      |  {t="c"} 8 12 _
      |
      |eval instant at 1m sum(trio)
      |  {} {{schema:0 count:14 sum:23 buckets:[1 4 7 2]}}
      |
      |eval instant at 1m avg(trio)
      |  {} {{schema:0 count:4.666666666666667 sum:7.666666666666666 buckets:[0.3333333333333333 1.3333333333333333 2.3333333333333335 0.6666666666666666]}}
      |
      |eval instant at 1m sum(zmix)
      |  {} {{schema:0 count:7 sum:7 z_bucket:5 z_bucket_w:0.5 buckets:[2]}}
      |
      |eval instant at 1m sum(npmix)
      |  {} {{schema:0 count:6 sum:3 buckets:[2] n_buckets:[2 2]}}
      |
      |eval instant at 1m avg(zmix)
      |  {} {{schema:0 count:3.5 sum:3.5 z_bucket:2.5 z_bucket_w:0.5 buckets:[1]}}
      |
      |clear
      |
      |load 1m
      |  rctr{t="r"} {{schema:0 sum:10 count:10 buckets:[10]}} {{schema:0 sum:3 count:3 buckets:[3]}} {{schema:0 sum:5 count:5 buckets:[5]}}
      |
      |eval instant at 2m histogram_count(increase(rctr[3m]))
      |  {t="r"} 7.5
      |
      |eval instant at 3m histogram_count(increase(rctr[3m]))
      |  {t="r"} 6
      |""".stripMargin


  /** info() — experimental (Prometheus --enable-feature=promql-experimental-
    * functions): identity join on (job, instance), data-label enrichment,
    * v-label precedence on collision, identity-less pass-through, and the
    * multiple-match data error. */
  private val infoCorpus =
    """
      |load 10s
      |  svc{job="j1", instance="i1", x="1"} 1+1x10
      |  svc{job="j1", instance="i2", x="2"} 2+1x10
      |  svc{job="j2", instance="i1", x="3"} 3+1x10
      |  target_info{job="j1", instance="i1", env="prod", team="a"} 1+0x10
      |  target_info{job="j1", instance="i2", env="dev", team="b"} 1+0x10
      |
      |eval instant at 30s info(svc)
      |  {__name__="svc", job="j1", instance="i1", x="1", env="prod", team="a"} 4
      |  {__name__="svc", job="j1", instance="i2", x="2", env="dev", team="b"} 5
      |  {__name__="svc", job="j2", instance="i1", x="3"} 6
      |
      |eval instant at 30s info(svc, {env="prod"})
      |  {__name__="svc", job="j1", instance="i1", x="1", env="prod"} 4
      |  {__name__="svc", job="j1", instance="i2", x="2"} 5
      |  {__name__="svc", job="j2", instance="i1", x="3"} 6
      |
      |eval instant at 30s sum by (env) (info(svc))
      |  {env="prod"} 4
      |  {env="dev"} 5
      |  {} 6
      |
      |eval instant at 30s info(sum by (job, instance) (svc))
      |  {job="j1", instance="i1", env="prod", team="a"} 4
      |  {job="j1", instance="i2", env="dev", team="b"} 5
      |  {job="j2", instance="i1"} 6
      |
      |clear
      |
      |load 10s
      |  svc2{job="j", instance="a", x="keep"} 5+0x10
      |  svc2{job="j", instance="b"} 6+0x10
      |  target_info{job="j", instance="a", x="info", env="p"} 1+0x10
      |  target_info{job="j", instance="b", x="bx", env="q"} 1+0x10
      |
      |eval instant at 30s info(svc2)
      |  {__name__="svc2", job="j", instance="a", x="keep", env="p"} 5
      |  {__name__="svc2", job="j", instance="b", x="bx", env="q"} 6
      |
      |clear
      |
      |load 10s
      |  bare{z="1"} 7+0x10
      |  target_info{job="j", instance="a", env="p"} 1+0x10
      |
      |eval instant at 30s info(bare)
      |  {__name__="bare", z="1"} 7
      |
      |clear
      |
      |load 10s
      |  svc3{job="j", instance="a"} 1+0x10
      |  target_info{job="j", instance="a", env="p"} 1+0x10
      |  target_info{job="j", instance="a", env="q"} 1+0x10
      |
      |eval_fail instant at 30s info(svc3)
      |  expected_fail_message multiple info series match
      |""".stripMargin

  test("golden corpus: experimental info() identity-join cases match") {
    val segs = parseSegments(infoCorpus)
    assert(segs.map(s => s.evals.size + s.fails.size).sum == 7)
    val failures = segs.flatMap { sg =>
      val samples = toSamples(sg.loaded)
      checkInstant(samples, sg.evals, experimental = true) ++
        checkFails(samples, sg.fails, experimental = true)
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("golden corpus: load/eval instant cases match") {
    val segs = parseSegments(corpus)
    assert(segs.map(_.loaded.size).sum == 23 && segs.map(_.evals.size).sum == 209)
    assert(segs.map(_.fails.size).sum == 7)
    val failures = segs.filter(sg => sg.evals.nonEmpty || sg.fails.nonEmpty)
      .flatMap { sg =>
        val samples = toSamples(sg.loaded)
        checkInstant(samples, sg.evals) ++ checkFails(samples, sg.fails)
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("golden corpus: native-histogram literal cases match") {
    val segs = parseSegments(nhCorpus)
    assert(segs.size == 2, "clear splits the NH corpus into two segments")
    assert(segs.map(_.loaded.size).sum == 17 && segs.map(_.evals.size).sum == 57)
    assert(toSamples(segs.head.loaded).columns.contains("h"))
    val failures = segs.filter(_.evals.nonEmpty)
      .flatMap(sg => checkInstant(toSamples(sg.loaded), sg.evals))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("golden corpus: eval range cases match on the step grid") {
    val segs = parseSegments(corpus)
    assert(segs.map(_.ranges.size).sum == 11)
    val failures = segs.filter(_.ranges.nonEmpty)
      .flatMap(sg => checkRange(toSamples(sg.loaded), sg.ranges))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("golden corpus: native-histogram range cases match on the step grid") {
    val segs = parseSegments(nhCorpus)
    assert(segs.map(_.ranges.size).sum == 3)
    val failures = segs.filter(_.ranges.nonEmpty)
      .flatMap(sg => checkRange(toSamples(sg.loaded), sg.ranges))
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
