"""q191/q192 crowd adjudication — majority-vote rule and worker screen
pinned against a from-DEFINITION Python oracle over the same synthesized
answer table (the SQL twins share the md5 lottery, so only a definition
oracle catches vote-rule bugs; reference
eval/aturk/InterpretAmazonTurkResults.scala:95-210)."""

from collections import Counter, defaultdict

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def answers(ray_session):
    from pboh_entity_linking_ray.pipelines.er import _crowd_answers

    df = _crowd_answers(SF).to_pandas()   # O(review budget × 5) rows
    assert len(df) > 0
    return df


def test_answer_lottery_shape(answers):
    per_q = answers.groupby(["a", "b"]).size()
    assert per_q.between(2, 5).all()
    assert answers["worker_id"].between(0, 39).all()
    assert answers["work_time"].between(10, 129).all()
    assert set(answers["answer"]) <= {"argmax", "loopy", "google", "other",
                                      "spam_random", "spam_candidates"}
    # empty_other only ever set on 'other' answers
    assert (answers.loc[answers["empty_other"] == 1, "answer"]
            == "other").all()


def test_majority_vote_matches_definition(answers, ray_session):
    from pboh_entity_linking_ray.pipelines.er import (
        MIN_VOTES, q191_crowd_adjudication)

    got = q191_crowd_adjudication(SF).to_pandas()

    # the reference's isTheBestBy(diff=0): winner iff its count is
    # strictly greater than EVERY other distinct answer's count
    want = {}
    for (a, b), grp in answers.groupby(["a", "b"]):
        cnt = Counter(grp["answer"])
        n = len(grp)
        if n < MIN_VOTES:
            want[(a, b)] = (n, "unresolved")
            continue
        mx = max(cnt.values())
        at_max = [ans for ans, c in cnt.items() if c == mx]
        if len(at_max) > 1:
            res = "tie"
        elif at_max[0].startswith("spam"):
            res = "spam"
        else:
            res = at_max[0]
        want[(a, b)] = (n, res)

    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        n, res = want[(row.a, row.b)]
        assert (row.n_answers, row.resolution) == (n, res), (row.a, row.b)
    # the fixture must actually exercise the interesting arms
    ress = set(got["resolution"])
    assert "unresolved" in ress
    assert ress & {"argmax", "loopy", "google", "other"}


def test_worker_stats_match_definition(answers, ray_session):
    from pboh_entity_linking_ray.pipelines.er import q192_worker_stats

    got = q192_worker_stats(SF).to_pandas()

    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in answers.itertuples(index=False):
        s = agg[r.worker_id]
        s[0] += 1
        s[1] += r.work_time
        s[2] += r.answer == "spam_random"
        s[3] += r.answer == "spam_candidates"
        s[4] += r.empty_other
    assert len(got) == len(agg)
    for row in got.itertuples(index=False):
        n, t, sr, sc, eo = agg[row.worker_id]
        assert row.n_answers == n
        assert row.avg_time_s == t // n       # truncated avg (.intValue())
        assert (row.n_spam_random, row.n_spam_candidates,
                row.n_empty_other) == (sr, sc, eo)


def test_reject_republish_matches_definition(answers, ray_session):
    from pboh_entity_linking_ray.pipelines.er import q193_reject_republish

    got = q193_reject_republish(SF).to_pandas()
    want = answers.loc[answers["empty_other"] == 1,
                       ["a", "b", "worker_id"]] \
        .sort_values(["a", "b", "worker_id"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["reason"] == "empty-other").all()
    assert got[["a", "b", "worker_id"]].reset_index(drop=True) \
        .equals(want)
    assert len(got) > 0      # fixture exercises the reject arm


def test_vote_summary_conserves_questions(ray_session):
    from pboh_entity_linking_ray.pipelines.er import (
        q191_crowd_adjudication, q194_vote_summary)

    res = q191_crowd_adjudication(SF).to_pandas()
    summ = q194_vote_summary(SF).to_pandas()
    assert summ["n_questions"].sum() == len(res)
    want = res["resolution"].value_counts().to_dict()
    got = dict(zip(summ["resolution"], summ["n_questions"]))
    assert got == want


def test_answers_histogram_matches_lottery(answers, ray_session):
    from pboh_entity_linking_ray.pipelines.er import q195_answers_histogram

    got = q195_answers_histogram(SF).to_pandas()
    want = answers.groupby(["a", "b"]).size().value_counts().sort_index()
    assert dict(zip(got["n_answers"], got["n_questions"])) == \
        {int(k): int(v) for k, v in want.items()}
    assert got["n_answers"].between(2, 5).all()


def test_crowd_answers_deterministic_rerun(ray_session):
    """The lottery is a pure per-row md5 function of the question key:
    two independent executions of the full lazy pipeline must produce
    the identical answer multiset (the determinism clause every
    md5-lottery op promises)."""
    from pboh_entity_linking_ray.pipelines.er import _crowd_answers

    base = _crowd_answers(SF).to_pandas()
    again = _crowd_answers(SF).to_pandas()
    cols = list(base.columns)
    a = base.sort_values(cols).reset_index(drop=True)
    b = again.sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
