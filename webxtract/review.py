"""Confidence routing + human-review side-channel (M14-M18, J2).

Replaces the reference's Choice-state routing and A2I review loop:
  * route: Confidence >= 50 -> auto ("Succeeded"), else review
    (StateMachine.asl.json:54-65); rejected rows keep their gate verdict.
  * review task projection (fn-start-human-review/main.py:74-92) with a
    deterministic task id replacing the timestamp+uuid human-loop name
    (main.py:31-59) — wall-clock/uuid are forbidden for reproducibility
    (SURVEY.md M16).
  * join-back: the reference rendezvous via task token
    (fn-human-review-callback/main.py:56,71-79) becomes a join on url;
    the reviews side is small, so the default is a broadcast map-side
    join (ray.put once, dict lookup per batch) — no shuffle.
  * coalesce (client logic SmartOCR.vue:190-215): reviewed rows take
    review values with confidence 1.0 (non-empty) / 0.0 (empty);
    unreviewed review-rows stay "pending" (the 3600s-timeout analogue,
    StateMachine.asl.json:80).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .synth import _stable_hash

ROUTE_THRESHOLD = 50.0  # StateMachine.asl.json:58-63


def add_route(batch: pa.Table) -> pa.Table:
    """Append the route column: rejected | auto | review (M14)."""
    rejected = pc.is_valid(batch.column("reject_reason"))
    auto = pc.greater_equal(batch.column("model_confidence"), ROUTE_THRESHOLD)
    route = pc.if_else(
        rejected, pa.scalar("rejected"),
        pc.if_else(auto, pa.scalar("auto"), pa.scalar("review")),
    )
    return batch.append_column("route", route)


def make_review_tasks(batch: pa.Table) -> pa.Table:
    """Project route=='review' rows into the review-task shape (M15/M16)."""
    b = batch.filter(pc.equal(batch.column("route"), pa.scalar("review")))
    urls = b.column("url").to_pylist()
    task_ids = pa.array([f"task-{_stable_hash(u):016x}" for u in urls], pa.string())
    cols = {
        "task_id": task_ids,
        "url": b.column("url"),
        "date_value": b.column("date_value"),
        "date_conf": b.column("date_conf"),
        "total_value": b.column("total_value"),
        "total_conf": b.column("total_conf"),
        "vendor_value": b.column("vendor_value"),
        "vendor_conf": b.column("vendor_conf"),
        "model_confidence": b.column("model_confidence"),
    }
    return pa.table(cols)


class CoalesceReviews:
    """Broadcast map-side join of review answers onto model results (J2+M18).

    ``reviews_ref`` is a ``ray.put`` object ref of a dict
    ``url -> (date, total, vendor, worker_id)`` built once on the driver
    and fetched through the per-worker broadcast cache (never re-shipped
    per batch). Used as a plain function stage via ``coalesce_stage``
    (task pool — lookup stages must not reserve actor-pool minimums,
    see broadcast.py).
    """

    @staticmethod
    def _arrays(reviews: dict) -> tuple[pa.Array, ...]:
        urls = pa.array(list(reviews.keys()), pa.string())
        cols = list(zip(*reviews.values())) if reviews else ([], [], [], [])
        return (urls,
                pa.array(cols[0], pa.string()),   # date
                pa.array(cols[1], pa.string()),   # total
                pa.array(cols[2], pa.string()),   # vendor
                pa.array(cols[3], pa.string()))   # worker_id

    def __init__(self, reviews_ref):
        from .broadcast import get_broadcast_derived

        (self.r_urls, self.r_date, self.r_total, self.r_vendor,
         self.r_worker) = get_broadcast_derived(
            reviews_ref, "review_arrays", self._arrays)

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_review = pc.equal(batch.column("route"), pa.scalar("review"))
        if len(self.r_urls):
            idx = pc.index_in(batch.column("url"), value_set=self.r_urls)
            reviewed = pc.and_(is_review, pc.is_valid(idx))
        else:
            idx = None
            reviewed = pa.array([False] * batch.num_rows, pa.bool_())

        def pick(r_col, val_col: str, conf_col: str):
            if idx is None:
                return batch.column(val_col), batch.column(conf_col)
            rv = pc.take(r_col, idx)
            # review values override with confidence 1.0 (non-empty) /
            # 0.0 (SmartOCR.vue:193-207 renders reviewed fields certain)
            conf = pc.if_else(
                pc.and_(pc.is_valid(rv), pc.not_equal(rv, pa.scalar(""))),
                pa.scalar(1.0), pa.scalar(0.0))
            return (pc.if_else(reviewed, rv, batch.column(val_col)),
                    pc.if_else(reviewed, conf, batch.column(conf_col)))

        dv, dc = pick(self.r_date, "date_value", "date_conf")
        tv, tc = pick(self.r_total, "total_value", "total_conf")
        vv, vc = pick(self.r_vendor, "vendor_value", "vendor_conf")
        mc = pc.if_else(
            reviewed, pc.min_element_wise(dc, pc.min_element_wise(tc, vc)),
            batch.column("model_confidence"))
        route = pc.if_else(
            reviewed, pa.scalar("reviewed"),
            pc.if_else(is_review, pa.scalar("pending"),
                       batch.column("route")))
        reviewer = (pc.if_else(reviewed, pc.take(self.r_worker, idx),
                               pa.scalar(None, pa.string()))
                    if idx is not None
                    else pa.nulls(batch.num_rows, pa.string()))
        return pa.table({
            "url": batch.column("url"),
            "extracted_text": batch.column("extracted_text"),
            "vendor_value": vv,
            "vendor_conf": vc,
            "date_value": dv,
            "date_conf": dc,
            "total_value": tv,
            "total_conf": tc,
            "model_confidence": mc,
            "route": route,
            "reviewer": reviewer,
        })


def coalesce_stage(reviews_ref):
    """Task-pool closure applying CoalesceReviews per batch."""
    def fn(batch: pa.Table) -> pa.Table:
        return CoalesceReviews(reviews_ref)(batch)

    return fn


def coalesce_hash_join(results_ds, reviews_ds, num_partitions: int | None = None):
    """J2 at scale: when the reviews side is too large to broadcast,
    LEFT hash-join results x reviews on url (hash-partitioned exchange)
    and coalesce vectorized. Semantics identical to the broadcast path
    (tested); reviews must be pre-deduped one-row-per-url (latest
    answered_ts) — reviews_to_dict does that for the broadcast path, here
    the caller dedupes with dedup-by-latest if needed."""
    import pyarrow.compute as pc

    from .ops.relational import hash_join

    # Acero's hash join rejects list<struct> payload columns; the
    # alternatives are not part of FINAL_RESULT anyway
    results_ds = results_ds.drop_columns(["alt_date", "alt_total"])
    joined = hash_join(results_ds, reviews_ds, on="url",
                       join_type="left_outer",
                       num_partitions=num_partitions)

    def coalesce(batch: pa.Table) -> pa.Table:
        reviewed = pc.and_(pc.is_valid(batch.column("worker_id")),
                           pc.equal(batch.column("route"), pa.scalar("review")))

        def pick(review_col, model_col):
            rc = batch.column(review_col)
            conf = pc.if_else(
                pc.and_(pc.is_valid(rc), pc.not_equal(rc, pa.scalar(""))),
                pa.scalar(1.0), pa.scalar(0.0))
            val = pc.if_else(reviewed, rc, batch.column(model_col))
            cval = pc.if_else(reviewed, conf, batch.column(model_col[:-5] + "conf"))
            return val, cval

        dv, dc = pick("date", "date_value")
        tv, tc = pick("total", "total_value")
        vv, vc = pick("vendor", "vendor_value")
        mc = pc.if_else(
            reviewed, pc.min_element_wise(dc, pc.min_element_wise(tc, vc)),
            batch.column("model_confidence"))
        route = pc.if_else(
            reviewed, pa.scalar("reviewed"),
            pc.if_else(pc.equal(batch.column("route"), pa.scalar("review")),
                       pa.scalar("pending"), batch.column("route")))
        reviewer = pc.if_else(reviewed, batch.column("worker_id"),
                              pa.scalar(None, pa.string()))
        return pa.table({
            "url": batch.column("url"),
            "extracted_text": batch.column("extracted_text"),
            "vendor_value": vv, "vendor_conf": vc,
            "date_value": dv, "date_conf": dc,
            "total_value": tv, "total_conf": tc,
            "model_confidence": mc,
            "route": route,
            "reviewer": reviewer,
        })

    return joined.map_batches(coalesce, batch_format="pyarrow",
                              zero_copy_batch=True)


def read_reviews(path: str):
    """Source S6: review answers parquet (the reviews-bucket consumer,
    template.sam.yml:140-144) -> Dataset with the REVIEWS schema."""
    import ray.data as rd

    return rd.read_parquet(path)


def reviews_to_dict(reviews) -> dict:
    """Reviews table/Dataset -> broadcast lookup dict (M17 answer
    extraction: fn-human-review-callback/main.py:61-79 takes
    humanAnswers[0]; with a table one row per url IS the single answer;
    if duplicates exist the latest answered_ts wins, deterministically)."""
    if not isinstance(reviews, pa.Table):  # Dataset (small side)
        reviews = pa.concat_tables(
            list(reviews.iter_batches(batch_format="pyarrow")))
    idx = pc.sort_indices(
        reviews, sort_keys=[("url", "ascending"), ("answered_ts", "ascending")]
    )
    t = reviews.take(idx)
    out: dict = {}
    for u, d, tt, v, w in zip(
        t.column("url").to_pylist(), t.column("date").to_pylist(),
        t.column("total").to_pylist(), t.column("vendor").to_pylist(),
        t.column("worker_id").to_pylist(),
    ):
        out[u] = (d, tt, v, w)  # later rows overwrite: latest wins
    return out
