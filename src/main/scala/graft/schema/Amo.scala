package graft.schema

/** Typed schemas for the AMO addon catalog and the client-profile
  * projection (SURVEY.md §1.2-§1.3; reference: taar_amodump.py:52-76 for
  * the addon JSONSchema `meta` maps, taar_profile_bigtable.py:76-92 and
  * :270-290 for the profile CTAS projection and the active_addons
  * element struct).
  *
  * `from_json(col, Encoders.product[AmoAddon].schema)` reproduces the
  * reference `marshal()` semantics (taar_amodump.py:255-291): undeclared
  * keys are projected away, scalars are coerced, and absent keys surface
  * as null.
  */
case class AmoFile(
    id: Long,
    platform: String,
    status: String,
    is_webextension: Boolean)

case class AmoVersion(files: Seq[AmoFile])

case class AmoRatings(
    average: Double,
    bayesian_average: Double,
    count: Long,
    text_count: Long)

case class AmoPromoted(category: String)

case class AmoAddon(
    guid: String,
    categories: Map[String, Seq[String]],
    default_locale: String,
    description: Map[String, String],
    name: Map[String, String],
    current_version: AmoVersion,
    ratings: AmoRatings,
    promoted: AmoPromoted,
    summary: Map[String, String],
    tags: Seq[String],
    weekly_downloads: Long,
    first_create_date: Option[String])

/** active_addons element struct — the 16 fields of
  * taar_profile_bigtable.py:270-290. */
case class ActiveAddon(
    addon_id: String,
    blocklisted: Boolean,
    name: String,
    user_disabled: Boolean,
    app_disabled: Boolean,
    version: String,
    scope: Long,
    `type`: String,
    foreign_install: Boolean,
    has_binary_components: Boolean,
    install_day: Long,
    update_day: Long,
    signed_state: Long,
    is_system: Boolean,
    is_web_extension: Boolean,
    multiprocess_compatible: Boolean)

/** The profile CTAS projection (taar_profile_bigtable.py:76-92). */
case class ClientProfile(
    client_id: String,
    geo_city: String,
    subsession_length: Option[Long],
    locale: String,
    os: String,
    active_addons: Seq[ActiveAddon],
    bookmark_count: Option[Long],
    tab_open_count: Option[Long],
    total_uri: Option[Long],
    unique_tlds: Option[Long],
    submission_date: String)

object Amo {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.types.StructType

  lazy val addonSchema: StructType = Encoders.product[AmoAddon].schema
  lazy val profileSchema: StructType = Encoders.product[ClientProfile].schema
}
