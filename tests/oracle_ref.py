"""Pure-Python oracle replicating the reference's per-row decision logic
(check_landing_page_author_affiliation_parsing_against_openalex.py:123-269),
driven by our own kernels (normalize_text == :16-27; indel_ratio ==
rapidfuzz fuzz.ratio). Used to differential-test the Spark implementation
in operators/scoring_ref.py.
"""

from __future__ import annotations

from reconcile_pkp_beacon_journals_w_openalex_affiliation_metadata_spark.functions.kernels import (
    indel_ratio,
    normalize_text,
)


def clean_doi(doi: str) -> str:
    if doi.startswith("https://doi.org/"):
        return doi.replace("https://doi.org/", "", 1)
    if doi.startswith("doi:"):
        return doi.replace("doi:", "", 1)
    return doi


def score_rows(landing_rows: list[dict], works: list[dict]) -> list[dict]:
    """Reference loop re-implemented verbatim (semantics, not code)."""
    works_by_doi: dict[str, dict] = {}
    for w in works:
        d = w.get("doi")
        if d:
            works_by_doi.setdefault(clean_doi(d.strip()), w)

    out = []
    for row in landing_rows:
        doi = row.get("DOI")
        if not doi or not isinstance(doi, str) or not doi.strip().startswith("10."):
            continue  # :66-71
        doi = doi.strip()
        work = works_by_doi.get(doi)
        authorships = (work or {}).get("authorships") or []
        if not isinstance(authorships, list):
            authorships = []

        author_raw = row.get("Author") or ""
        inst_raw = row.get("Institution") or ""
        author_norm = normalize_text(author_raw)
        inst_norm = normalize_text(inst_raw)

        best_score = -1.0
        best_idx = -1
        if author_norm and authorships:
            for idx, a in enumerate(authorships):
                name = a.get("raw_author_name", "") or a.get("author", {}).get(
                    "display_name", ""
                ) or ""
                s = indel_ratio(author_norm, normalize_text(name))
                if s > best_score:
                    best_score = s
                    best_idx = idx
                    if best_score == 100.0:
                        break

        res = {
            **{k: row.get(k) for k in ("RelativeFilePath", "DOI", "Author", "Institution", "Source")},
            "exact_author_match": False,
            "normalized_author_match": False,
            "author_similarity_score": 0.0,
            "exact_institution_match": False,
            "normalized_institution_match": False,
            "institution_similarity_score": 0.0,
            "openalex_matched_author_name": "",
            "openalex_matched_institution_strings": "",
        }
        if best_idx != -1:
            best = authorships[best_idx]
            best_name = best.get("raw_author_name")
            if not best_name:
                best_name = best.get("author", {}).get("display_name", "") or ""
            res["openalex_matched_author_name"] = best_name if best_name else ""
            best_norm = normalize_text(best_name)
            res["author_similarity_score"] = round(best_score, 2)
            res["exact_author_match"] = author_raw == best_name
            res["normalized_author_match"] = author_norm == best_norm

            raw_affils = best.get("raw_affiliation_strings", []) or []
            res["openalex_matched_institution_strings"] = "; ".join(raw_affils)
            norm_affils = [normalize_text(a) for a in raw_affils if a]
            norm_affils = [a for a in norm_affils if a]

            if not inst_raw:
                res["exact_institution_match"] = not bool(raw_affils)
            elif raw_affils:
                res["exact_institution_match"] = any(
                    inst_raw.lower() == x.lower() for x in raw_affils
                )
            if not inst_norm:
                res["normalized_institution_match"] = not bool(norm_affils)
            elif norm_affils:
                res["normalized_institution_match"] = inst_norm in norm_affils
            if not inst_norm:
                res["institution_similarity_score"] = 100.0 if not norm_affils else 0.0
            elif norm_affils:
                res["institution_similarity_score"] = round(
                    max(indel_ratio(inst_norm, x) for x in norm_affils), 2
                )
        out.append(res)
    return out
